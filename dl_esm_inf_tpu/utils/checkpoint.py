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
from ..core.field import Field


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
                stacked = layout.stack_global(fld.grid.decomp, g,
                                              mode="zeros",
                                              dtype=np.dtype(fld.dtype))
                fld.set_data(stacked)
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

def save_fields_orbax(path: str, fields: dict, step: int = 0) -> None:
    """Save fields' sharded device arrays directly via orbax
    (StandardCheckpointer): each host writes only its own shards, so
    checkpoint size is not bounded by host memory — the production-
    scale path.  Trade-off vs :func:`save_fields`: the on-disk form is
    the stacked LOCAL-shard layout, so restore requires the SAME
    decomposition (npz checkpoints are global-form and elastic across
    mesh shapes)."""
    import orbax.checkpoint as ocp

    tree = {name: fld.data for name, fld in fields.items()}
    tree["__step__"] = np.asarray(step, dtype=np.int64)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_fields_orbax(path: str, fields: dict) -> int:
    """Restore fields saved by :func:`save_fields_orbax` onto the SAME
    decomposition; returns the saved step."""
    import orbax.checkpoint as ocp

    target = {name: fld.data for name, fld in fields.items()}
    target["__step__"] = np.asarray(0, dtype=np.int64)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target)
    for name, fld in fields.items():
        fld.data = restored[name]
    return int(restored["__step__"])
