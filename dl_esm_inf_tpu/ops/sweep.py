"""Generic temporal-blocked stencil-sweep engine (Pallas/Mosaic).

The framework's per-chip execution engine: ANY client model whose step
is a bounded-reach stencil chain over (ly, lx) blocks gets the fused
fast path by supplying a block step function — the TPU analogue of the
reference library's role of running client kernels over its fields
(dl_esm_inf itself ships no physics; SURVEY §3.6).

Mechanics (measured rules in ops/pallas_step.py's history):

* the local shard block is processed in row-strip tiles; each tile's
  input window carries an 8-row alignment ring (Mosaic rejects
  non-8-aligned DMA row offsets for f32 sublane tiling);
* the tile loop is a double-buffered DMA pipeline processed in PAIRS
  with Python-static buffer slots (dynamic ``buf[slot]`` indexing
  measured ~17 us/step of VMEM shuffling on v5e);
* ``steps_per_sweep`` (K) applies the step K times per window while it
  is VMEM-resident — temporal blocking: one HBM read+write AND one
  (deep) halo exchange per K steps.  Requires K*reach <= 8 (the ring)
  and a shard halo of width >= K*reach.

Used by ops/pallas_step.py (NEMOLite2D) and models/gravity_wave.py.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stencils
from .fastpath import RING  # noqa: E402  (single source of the ring size)


def _cdiv(a, b):
    return -(-a // b)


def make_stencil_sweep(step_fn, *, ly: int, lx: int, state_dtypes,
                       aux_dtypes=(), n_scalars: int = 0,
                       steps_per_sweep: int = 1, reach: int = 2,
                       prepare_fn=None, tile_rows: int | None = None,
                       interpret: bool = False, hardware_rolls: bool = True,
                       vmem_limit_bytes: int = 100 * 1024 * 1024):
    """Build ``sweep(*state, *aux, scalars) -> state'`` for one shard block.

    ``step_fn(state: tuple, prepared, scalars: tuple) -> tuple`` advances
    the state by ONE step on a VMEM window; it is applied K times per
    window.  ``prepare_fn(aux_windows: tuple) -> prepared`` runs once per
    tile (hoisting per-tile constants, e.g. mask decode); default
    passes the aux windows through.  ``scalars`` is a (K, n_scalars)
    array of per-sub-step scalar parameters (SMEM).

    All state/aux arrays are (ly, lx); state dtypes stream in AND out,
    aux dtypes stream in only.  Total stencil reach per step must be
    <= ``reach``.
    """
    state_dtypes = tuple(jnp.dtype(d) for d in state_dtypes)
    aux_dtypes = tuple(jnp.dtype(d) for d in aux_dtypes)
    if not interpret and any(d.itemsize == 8
                             for d in state_dtypes + aux_dtypes):
        raise ValueError(
            "Mosaic TPU kernels do not support 64-bit dtypes (measured: "
            "NotImplementedError on v5e); run float64 on the jnp path, "
            "or the sweep in interpret mode")
    if not interpret and any(d.itemsize < 4 for d in state_dtypes):
        raise ValueError(
            "compiled sweeps support 4-byte state dtypes only: the 8-row "
            "window ring matches f32 sublane tiling, and bf16 state "
            "measured a Mosaic compile failure on v5e (sub-4-byte AUX "
            "planes like the int8 masks are fine); run bf16 on the jnp "
            "path or in interpret mode")
    n_state, n_aux = len(state_dtypes), len(aux_dtypes)
    n_in = n_state + n_aux
    K = int(steps_per_sweep)
    if K < 1:
        raise ValueError(f"steps_per_sweep must be >= 1, got {K}")
    if K * reach > RING:
        raise ValueError(
            f"steps_per_sweep={K} * reach={reach} exceeds the {RING}-row "
            "window ring")
    if ly % 8 != 0:
        raise ValueError(
            f"stencil sweep needs 8-row-aligned blocks (local_ny={ly}); "
            "decompose with align_y=8")
    if prepare_fn is None:
        def prepare_fn(aux):
            return aux

    TY = tile_rows or min(64, ly)
    TY = min(TY, ly)
    if TY % 8 != 0:
        raise ValueError(f"tile_rows must be a multiple of 8, got {TY}")
    H = min(TY + 2 * RING, ly)
    n_tiles = _cdiv(ly, TY)

    def _rows(i):
        ry = pl.multiple_of(jnp.minimum(i * TY, ly - TY), 8)
        wy = pl.multiple_of(jnp.clip(ry - RING, 0, ly - H), 8)
        off = pl.multiple_of(ry - wy, 8)
        return ry, wy, off

    def kernel(scalars_ref, *refs):
        ins_of = refs[:n_in]
        outs_of = refs[n_in:n_in + n_state]
        wins = refs[n_in + n_state:2 * n_in + n_state]
        obufs = refs[2 * n_in + n_state:2 * n_in + 2 * n_state]
        in_sems, out_sems = refs[-2], refs[-1]

        def in_dmas(slot, i):
            _, wy, _ = _rows(i)
            return [pltpu.make_async_copy(src.at[pl.ds(wy, H), :],
                                          w.at[slot], in_sems.at[k, slot])
                    for k, (src, w) in enumerate(zip(ins_of, wins))]

        def out_dmas(slot, i):
            ry, _, off = _rows(i)
            return [pltpu.make_async_copy(o.at[slot, pl.ds(off, TY), :],
                                          dst.at[pl.ds(ry, TY), :],
                                          out_sems.at[k, slot])
                    for k, (o, dst) in enumerate(zip(obufs, outs_of))]

        def tile(slot, i):
            @pl.when(i + 1 < n_tiles)
            def _():
                for c in in_dmas(1 - slot, i + 1):
                    c.start()
            for c in in_dmas(slot, i):
                c.wait()

            # hardware_rolls: stencil shifts in step_fn/prepare_fn lower
            # to the TPU vector rotate instead of slice+slice+concat
            # (exact permutation either way; the step is VPU-bound)
            roll_ctx = (stencils.hw_rolls() if hardware_rolls
                        else contextlib.nullcontext())
            with roll_ctx:
                state = tuple(wins[k][slot] for k in range(n_state))
                prepared = prepare_fn(tuple(wins[n_state + k][slot]
                                            for k in range(n_aux)))
                for k in range(K):
                    sc = tuple(scalars_ref[k, j] for j in range(n_scalars))
                    state = step_fn(state, prepared, sc)

            @pl.when(i >= 2)
            def _():
                for c in out_dmas(slot, i - 2):
                    c.wait()
            for k in range(n_state):
                obufs[k][slot] = state[k]
            for c in out_dmas(slot, i):
                c.start()

        for c in in_dmas(0, 0):
            c.start()

        def pair(j, _):
            tile(0, 2 * j)
            tile(1, 2 * j + 1)
            return 0

        jax.lax.fori_loop(0, n_tiles // 2, pair, 0)
        if n_tiles % 2:
            tile(0, n_tiles - 1)   # odd tail: n_tiles-1 is even -> slot 0
        for i in (n_tiles - 2, n_tiles - 1):
            if i >= 0:
                for c in out_dmas(i % 2, i):
                    c.wait()

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = ([pltpu.VMEM((2, H, lx), d) for d in state_dtypes]
               + [pltpu.VMEM((2, H, lx), d) for d in aux_dtypes]
               + [pltpu.VMEM((2, H, lx), d) for d in state_dtypes]
               + [pltpu.SemaphoreType.DMA((n_in, 2)),
                  pltpu.SemaphoreType.DMA((n_state, 2))])
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [any_spec] * n_in,
        out_specs=tuple([any_spec] * n_state),
        out_shape=tuple(jax.ShapeDtypeStruct((ly, lx), d)
                        for d in state_dtypes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
    )

    def sweep(*arrays_and_scalars):
        if n_scalars == 0 and len(arrays_and_scalars) == n_in:
            # pinned 32-bit: under jax_enable_x64 a bare zeros() would be
            # f64, handing Mosaic an unsupported SMEM operand
            arrays, scalars = arrays_and_scalars, jnp.zeros((K, 1),
                                                            jnp.float32)
        else:
            *arrays, scalars = arrays_and_scalars
        if len(arrays) != n_in:
            raise ValueError(f"expected {n_in} arrays, got {len(arrays)}")
        sc = jnp.asarray(scalars).reshape((K, max(n_scalars, 1)))
        return call(sc, *arrays)

    return sweep
