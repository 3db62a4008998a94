"""Fused Pallas TPU kernel for the NEMOLite2D time step.

The jnp step is ~60 elementwise/roll ops; XLA materialises many
intermediates, costing ~35 HBM array-passes per step.  This kernel does
the whole step — mask derivation, next_sshu/v, continuity, boundary
forcing, momentum, Flather — in ONE pass over HBM:

* per row-strip tile, DMA a (TY+16, lx)-row window of the three
  prognostics + the int8 tmask from HBM into VMEM (the ring covers the
  step's total stencil reach of 2, rounded to Mosaic's 8-row f32
  sublane tile so every DMA offset is aligned — the chain then needs no
  cross-tile communication, the same redundant-compute argument as the
  shard-level deep halo);
* evaluate :func:`..models.nemolite2d.step_math` on the window (the
  physics is written once and shared with the jnp path);
* DMA the (TY, lx) result rows of ssha/ua/va back to HBM.

The tile loop is a double-buffered DMA pipeline (guide: Patterns /
Double Buffering) processed in PAIRS with Python-static slot indices:
tiles 2j use slot 0, 2j+1 slot 1.  Measured on v5e (scripts/kbench.py),
dynamic `buf[slot]` first-dim indexing cost ~17 us/step of VMEM
shuffling; static slots put the step at the kernel's pure-compute
floor — the DMAs are then fully hidden (step is VPU-bound, not
HBM-bound: ~10 us of DMA vs ~50 us of compute per 1024^2 step).

HBM traffic: ~(TY+16)/TY * 13 B read + 12 B written per point — within
a few % of the 25 B/pt speed-of-light for this state layout.

Halo rows/cols of the output hold window-wrapped garbage (finite by
construction: every division in the step is bounded away from zero);
they are exactly the cells the next halo exchange overwrites or the
masks keep inert — identical semantics to the jnp path, which also
computes garbage there (block-wrapped instead of window-wrapped).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


@functools.lru_cache(maxsize=None)
def make_fused_step(ly: int, lx: int, dtype_str: str, p, dx: float,
                    dy: float, fcor: float, depth: float,
                    tile_rows: int | None = None, interpret: bool = False,
                    steps_per_sweep: int = 1, hoist_masks: bool = True,
                    variable_bathy: bool = False):
    """Build the fused step callable: (sshn, un, vn, tmask_i8, forcing)

    -> (ssha, ua, va), all shaped (ly, lx) per shard block.

    ``steps_per_sweep`` (K, 1..4) enables TEMPORAL BLOCKING: K whole
    time steps are advanced per tile sweep, so each point costs one HBM
    read+write per K steps instead of per step.  The step's stencil
    reach is 2, so K steps reach 2K <= 8 cells — within the window's
    8-row alignment ring, and within the shard halo provided the field
    was decomposed with ``halo_width >= 2K`` (the deep-halo redundant-
    compute argument; the caller must exchange at depth 2K every K
    steps).  ``forcing`` becomes a length-K vector of per-sub-step
    boundary values.  The kernel went HBM-bound once the VPU work per
    step dropped below the DMA time (scripts/kbench.py); K=2 rebalances
    it.

    ``variable_bathy``: the T-point depth is a per-point array streamed
    as a 4th field window (``fused(..., ht=...)``); U/V-face depths are
    derived in-VMEM.  ``depth`` is then ignored.  The array is
    time-invariant, so its halo is always fresh and temporal blocking
    needs no extra ring."""
    from ..models.nemolite2d import (_recip_exact, _recip_fast, decode_masks,
                                     step_math)

    dtype = jnp.dtype(dtype_str)
    # The step's two 1/dep divides are ~10-35% of its VPU time (measured,
    # scripts/kbench.py); hardware approx-reciprocal + one Newton step is
    # ~1 ulp at f32.  Interpret mode keeps the exact divide so the
    # CPU-mesh tests can require bitwise agreement with the jnp path.
    recip = (_recip_fast if dtype == jnp.float32 and not interpret
             else _recip_exact)
    K = int(steps_per_sweep)
    if not 1 <= K <= 4:
        raise ValueError(f"steps_per_sweep must be in [1, 4], got {K}")
    if ly % 8 != 0:
        raise ValueError(
            f"fused Pallas step needs 8-row-aligned shards (local_ny={ly}); "
            "decompose with align_y=8 (models.nemolite2d.build(pallas=True) "
            "does this)")
    # Window ring of 8 rows per side (the physics needs 2; 8 satisfies
    # Mosaic's f32 sublane tiling so every DMA row offset is aligned —
    # unaligned offsets fail to compile).  TY=64 measured fastest on
    # v5e: small enough for good vreg locality, large enough that the
    # 25% ring overhead is amortised by pipeline overlap.
    TY = tile_rows or min(64, ly)
    TY = min(TY, ly)
    if TY % 8 != 0:
        raise ValueError(f"tile_rows must be a multiple of 8, got {TY}")
    H = min(TY + 16, ly)         # input window rows
    n_tiles = _cdiv(ly, TY)

    def _rows(i):
        """(output-row start, window-row start, in-window offset) of tile i;

        all 8-aligned for Mosaic's f32 sublane tiling."""
        ry = pl.multiple_of(jnp.minimum(i * TY, ly - TY), 8)
        wy = pl.multiple_of(jnp.clip(ry - 8, 0, ly - H), 8)
        off = pl.multiple_of(ry - wy, 8)
        return ry, wy, off

    def kernel(forcing_ref, *refs):
        if variable_bathy:
            (sshn_hbm, un_hbm, vn_hbm, tm_hbm, ht_hbm,
             ssha_hbm, ua_hbm, va_hbm,
             w_ssh, w_un, w_vn, w_tm, w_ht, o_ssh, o_ua, o_va,
             in_sems, out_sems) = refs
            ins_of = [sshn_hbm, un_hbm, vn_hbm, tm_hbm, ht_hbm]
            wins = [w_ssh, w_un, w_vn, w_tm, w_ht]
        else:
            (sshn_hbm, un_hbm, vn_hbm, tm_hbm,
             ssha_hbm, ua_hbm, va_hbm,
             w_ssh, w_un, w_vn, w_tm, o_ssh, o_ua, o_va,
             in_sems, out_sems) = refs
            ins_of = [sshn_hbm, un_hbm, vn_hbm, tm_hbm]
            wins = [w_ssh, w_un, w_vn, w_tm]
        outs_of = [ssha_hbm, ua_hbm, va_hbm]
        obufs = [o_ssh, o_ua, o_va]

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
            """Process tile ``i`` in buffer ``slot`` (slot Python-static)."""
            @pl.when(i + 1 < n_tiles)
            def _():
                for c in in_dmas(1 - slot, i + 1):
                    c.start()
            for c in in_dmas(slot, i):
                c.wait()

            ssha, ua, va = w_ssh[slot], w_un[slot], w_vn[slot]
            dep = w_ht[slot] if variable_bathy else depth
            # decode once per tile (vs per sub-step) trades ~19 VPU ops
            # per extra sub-step against 6 window arrays of VMEM
            # residency across the chain
            masks = decode_masks(w_tm[slot], dtype) if hoist_masks else None
            for k in range(K):
                ssha, ua, va = step_math(
                    ssha, ua, va, w_tm[slot], p, dx, dy, fcor, dep,
                    forcing=forcing_ref[k], exch_mid=None, recip=recip,
                    masks=masks)

            # fence: tile i-2 used this out slot; its DMA must be done
            @pl.when(i >= 2)
            def _():
                for c in out_dmas(slot, i - 2):
                    c.wait()
            o_ssh[slot] = ssha
            o_ua[slot] = ua
            o_va[slot] = va
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
    n_in = 5 if variable_bathy else 4
    scratch = [
        pltpu.VMEM((2, H, lx), dtype),      # sshn windows
        pltpu.VMEM((2, H, lx), dtype),      # un windows
        pltpu.VMEM((2, H, lx), dtype),      # vn windows
        pltpu.VMEM((2, H, lx), jnp.int8),   # tmask windows
    ]
    if variable_bathy:
        scratch.append(pltpu.VMEM((2, H, lx), dtype))   # ht windows
    scratch += [
        pltpu.VMEM((2, H, lx), dtype),      # ssha out buffers
        pltpu.VMEM((2, H, lx), dtype),      # ua out buffers
        pltpu.VMEM((2, H, lx), dtype),      # va out buffers
        pltpu.SemaphoreType.DMA((n_in, 2)),
        pltpu.SemaphoreType.DMA((3, 2)),
    ]
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [any_spec] * n_in,
        out_specs=(any_spec, any_spec, any_spec),
        out_shape=(jax.ShapeDtypeStruct((ly, lx), dtype),) * 3,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def fused(sshn, un, vn, mask_codes_i8, forcing, ht=None):
        f = jnp.asarray(forcing, dtype).reshape((K,))
        if variable_bathy:
            return call(f, sshn, un, vn, mask_codes_i8, ht)
        return call(f, sshn, un, vn, mask_codes_i8)

    return fused
