"""Checkpoint / resume.

The reference has none (SURVEY §5: 'Checkpoint / resume: none'); the
closest machinery is gather_inner_data (field_mod.f90:1313-1390).  Here
checkpointing is a first-class subsystem: a model's prognostic fields
are a dict of global arrays, saved either as

* a portable ``.npz`` of gathered global arrays (small/medium runs,
  restartable on a different mesh shape), or
* an `orbax` sharded checkpoint of the raw device arrays (large runs),
  when orbax is available.

Restart-on-a-different-decomposition works through the global form: the
arrays are gathered to (global_ny, global_nx) and re-scattered into the
target grid's layout.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..core import layout
from ..core.field import Field, _sharding_nd


def save_fields(path: str, fields: dict, step: int = 0,
                attrs: dict | None = None) -> None:
    """Save named fields' *global internal* arrays + metadata to .npz."""
    arrays = {}
    meta = {"step": int(step), "names": sorted(fields), "version": 1}
    if attrs:
        meta["attrs"] = attrs
    for name, fld in fields.items():
        if isinstance(fld, Field):
            arrays[name] = fld.gather_inner_data()
        else:
            arrays[name] = np.asarray(fld)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_fields(path: str, fields: dict) -> dict:
    """Restore named fields in place (re-scattering onto each field's

    own decomposition — mesh shape may differ from the saving run's).
    Returns the metadata dict."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        loaded = {}
        for name, fld in fields.items():
            if name not in data:
                raise KeyError(f"checkpoint {path} has no field {name!r}")
            g = data[name]
            if isinstance(fld, Field):
                dt = np.dtype(fld.dtype)
                if fld.levels is not None:
                    if g.shape[0] != fld.levels:
                        raise ValueError(
                            f"checkpoint field {name!r} has {g.shape[0]} "
                            f"levels, field expects {fld.levels}")
                    stacked = np.stack([
                        layout.stack_global(fld.grid.decomp, g[k],
                                            mode="zeros", dtype=dt)
                        for k in range(fld.levels)])
                else:
                    stacked = layout.stack_global(fld.grid.decomp, g,
                                                  mode="zeros", dtype=dt)
                fld.set_data(stacked)
                if fld.grid.decomp.halo > 0:
                    fld.halo_exchange(1)
            else:
                # plain arrays round-trip symmetrically with save_fields
                loaded[name] = g
        if loaded:
            meta = dict(meta, arrays=loaded)
    return meta


def save_model(path: str, model, extra: dict | None = None) -> None:
    """Checkpoint a model exposing ``.checkpoint_fields()`` (or the

    standard NEMOLite2D/GravityWave field names)."""
    fields, step = _model_fields(model)
    save_fields(path, fields, step=step, attrs=extra)


def load_model(path: str, model) -> dict:
    fields, _ = _model_fields(model)
    meta = load_fields(path, fields)
    if hasattr(model, "_istep0"):
        model._istep0 = int(meta.get("step", 0))
    return meta


def _model_fields(model):
    if hasattr(model, "checkpoint_fields"):
        return model.checkpoint_fields(), getattr(model, "_istep0", 0)
    names = [n for n in ("sshn_t", "un", "vn", "eta", "u", "v")
             if hasattr(model, n)]
    return ({n: getattr(model, n) for n in names},
            getattr(model, "_istep0", 0))


# ---------------------------------------------------------------------------
# Orbax backend: sharded checkpoints WITHOUT a host gather.
# ---------------------------------------------------------------------------

def _unstack_device(fld: Field):
    """Field -> GLOBAL-form (..., gny, gnx) jax array, sharded over the
    field's mesh — no host gather, no single-device gather.  Leading
    dims (multi-level fields) are carried through."""
    import jax

    grid = fld.grid
    decomp = grid.decomp

    def fn(d):
        return layout.unstack_internal(decomp, d)

    lead = fld.data.ndim - 2
    return jax.jit(fn, out_shardings=_sharding_nd(grid, lead))(fld.data)


def _stack_device(fld: Field, g):
    """GLOBAL-form sharded array -> the field's stacked layout, with
    zeroed halo/padding (the npz path's mode="zeros"), on device.
    Leading dims (multi-level fields) are carried through."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    grid = fld.grid
    d = grid.decomp
    h = d.halo
    lead = g.ndim - 2
    sh = _sharding_nd(grid, lead)
    pspec = P(*((None,) * lead), "y", "x")
    zero = ((0, 0),) * lead

    ry = getattr(grid.halo_spec, "repy", 1)
    rx = getattr(grid.halo_spec, "repx", 1)

    def fn(gg):
        gp = jnp.pad(gg, zero + ((0, d.nprocy * d.tile_ny - d.global_ny),
                                 (0, d.nprocx * d.tile_nx - d.global_nx)))
        gp = jax.lax.with_sharding_constraint(gp, sh)

        def blk(b):
            # a device block holds (ry, rx) logical tiles; each gets its
            # own halo/padding ring (over-decomposition-aware)
            v = b.reshape(b.shape[:-2] + (ry, d.tile_ny, rx, d.tile_nx))
            v = jnp.pad(v, zero + ((0, 0),
                                   (h, d.local_ny - d.tile_ny - h),
                                   (0, 0),
                                   (h, d.local_nx - d.tile_nx - h)))
            return v.reshape(b.shape[:-2] + (ry * d.local_ny,
                                             rx * d.local_nx))

        return jax.shard_map(blk, mesh=grid.mesh, in_specs=pspec,
                             out_specs=pspec)(gp)

    return jax.jit(fn, out_shardings=sh)(g)


def save_fields_orbax(path: str, fields: dict, step: int = 0) -> None:
    """Save fields via orbax (StandardCheckpointer) as GLOBAL-form
    sharded device arrays: the internal points are unstacked on device
    (no host gather — each host writes only its own shards, so
    checkpoint size is bounded by neither host nor single-device
    memory) and the on-disk logical shape is (global_ny, global_nx) —
    independent of the decomposition, so restore is MESH-ELASTIC like
    the npz path."""
    import orbax.checkpoint as ocp

    tree = {name: _unstack_device(fld) for name, fld in fields.items()}
    tree["__step__"] = np.asarray(step, dtype=np.int64)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_fields_orbax(path: str, fields: dict) -> int:
    """Restore fields saved by :func:`save_fields_orbax` onto each
    field's OWN decomposition — the mesh shape may differ from the
    saving run's (orbax reads each device's sub-range of the global
    array directly).  Returns the saved step."""
    import jax
    import orbax.checkpoint as ocp

    target = {}
    for name, fld in fields.items():
        d = fld.grid.decomp
        lead = () if fld.levels is None else (fld.levels,)
        target[name] = jax.ShapeDtypeStruct(
            lead + (d.global_ny, d.global_nx), np.dtype(fld.dtype),
            sharding=_sharding_nd(fld.grid, len(lead)))
    target["__step__"] = np.asarray(0, dtype=np.int64)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target)
    for name, fld in fields.items():
        fld.data = _stack_device(fld, restored[name])
        if fld.grid.decomp.halo > 0:
            fld.halo_exchange(1)
    return int(restored["__step__"])
