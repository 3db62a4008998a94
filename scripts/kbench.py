#!/usr/bin/env python
"""Kernel-variant microbench for the fused step (slope method, real chip).

Variants (--modes, comma list; --tys picks tile sizes):
  prod         — the production make_fused_step kernel
  full         — local copy of the dynamic-slot pipeline (historical)
  unroll       — local copy of the static-slot pipeline (historical)
  dma          — same DMA structure, compute = copy (DMA floor)
  compute      — step_math on a resident VMEM window, no DMA (VPU floor)
  compute_fast — same with the approx-reciprocal step
  tight        — unaligned (TY+4)-row windows; Mosaic rejects them
                 (kept as the record of why the ring is 8 rows)

The chip is time-shared: only adjacent, interleaved runs are
comparable (see memory: axon-tpu-quirks).  The local make_variant copy
of the kernel is a measurement mule and may drift from
ops/pallas_step.py — `prod` is always the real thing.
"""
from __future__ import annotations

import time

import jax
from dl_esm_inf_tpu.utils import compilation_cache
compilation_cache.enable()
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dl_esm_inf_tpu.models import nemolite2d as nl
from dl_esm_inf_tpu.models.nemolite2d import (_recip_exact, _recip_fast,
                                              step_math)
from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta


def _cdiv(a, b):
    return -(-a // b)


def slope_time(fn, n_lo=50, n_hi=250, reps=4):
    """Per-iteration seconds via two chain lengths."""
    lo = fn(n_lo); hi = fn(n_hi)
    lo(); hi()   # compile+warm

    def best(f):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); f(); b = min(b, time.perf_counter() - t0)
        return b
    return (best(hi) - best(lo)) / (n_hi - n_lo)


def make_variant(ly, lx, dtype, p, dx, dy, fcor, depth, TY, mode):
    """mode: 'full' | 'dma' | 'compute' | 'unroll' | 'tight'."""
    ring = 4 if mode == "tight" else 16
    H = min(TY + ring, ly)
    n_tiles = _cdiv(ly, TY)

    def _rows(i):
        ry = pl.multiple_of(jnp.minimum(i * TY, ly - TY), 8)
        if mode == "tight":
            wy = jnp.clip(ry - 2, 0, ly - H)
            return ry, wy, ry - wy
        wy = pl.multiple_of(jnp.clip(ry - 8, 0, ly - H), 8)
        off = pl.multiple_of(ry - wy, 8)
        return ry, wy, off

    def kernel(forcing_ref, sshn_hbm, un_hbm, vn_hbm, tm_hbm,
               ssha_hbm, ua_hbm, va_hbm,
               w_ssh, w_un, w_vn, w_tm, o_ssh, o_ua, o_va,
               in_sems, out_sems):
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

        if mode.startswith("compute"):
            recip = {"compute": _recip_exact,
                     "compute_fast": _recip_fast}[mode]
            # one DMA to land data, then pure compute per "tile"
            for c in in_dmas(0, 0):
                c.start()
            for c in in_dmas(0, 0):
                c.wait()

            def body(i, _):
                # hoisted prep + hardware rolls, like the production
                # kernel (a floor mule without them would overstate the
                # compute floor by the per-step prep cost).  The outputs
                # FEED BACK into the input windows: a loop whose body is
                # loop-invariant gets hoisted out entirely (measured: an
                # impossible 17 us "floor").
                from dl_esm_inf_tpu.models.nemolite2d import make_prep
                from dl_esm_inf_tpu.ops import stencils as st_mod
                with st_mod.hw_rolls():
                    prep = make_prep(w_tm[0], depth, p, jnp.float32,
                                     dx=dx, dy=dy)
                    ssha, ua, va = step_math(
                        w_ssh[0], w_un[0], w_vn[0], w_tm[0], p, dx, dy,
                        fcor, depth, forcing=forcing_ref[0],
                        exch_mid=None, recip=recip, prep=prep)
                w_ssh[0] = ssha
                w_un[0] = ua
                w_vn[0] = va
                return 0
            jax.lax.fori_loop(0, n_tiles, body, 0)
            o_ssh[0] = w_ssh[0]
            o_ua[0] = w_un[0]
            o_va[0] = w_vn[0]
            ry, _, off = _rows(0)
            for c in out_dmas(0, 0):
                c.start()
            for c in out_dmas(0, 0):
                c.wait()
            return

        if mode == "unroll":
            # static slot indices: tiles processed in pairs, Python-level
            # slot constants — no dynamic first-dim scratch indexing.
            for c in in_dmas(0, 0):
                c.start()

            def pair(j, _):
                for slot in (0, 1):
                    i = 2 * j + slot

                    @pl.when(i + 1 < n_tiles)
                    def _(slot=slot, i=i):
                        for c in in_dmas(1 - slot, i + 1):
                            c.start()
                    for c in in_dmas(slot, i):
                        c.wait()
                    ssha, ua, va = step_math(
                        w_ssh[slot], w_un[slot], w_vn[slot], w_tm[slot],
                        p, dx, dy, fcor, depth, forcing=forcing_ref[0],
                        exch_mid=None, recip=_recip_exact)

                    @pl.when(i >= 2)
                    def _(slot=slot, i=i):
                        for c in out_dmas(slot, i - 2):
                            c.wait()
                    o_ssh[slot] = ssha
                    o_ua[slot] = ua
                    o_va[slot] = va
                    for c in out_dmas(slot, i):
                        c.start()
                return 0

            jax.lax.fori_loop(0, n_tiles // 2, pair, 0)
            if n_tiles % 2:                       # static tail tile
                i, slot = n_tiles - 1, (n_tiles - 1) % 2
                for c in in_dmas(slot, i):
                    c.wait()
                ssha, ua, va = step_math(
                    w_ssh[slot], w_un[slot], w_vn[slot], w_tm[slot],
                    p, dx, dy, fcor, depth, forcing=forcing_ref[0],
                    exch_mid=None, recip=_recip_exact)
                @pl.when(i >= 2)
                def _():
                    for c in out_dmas(slot, i - 2):
                        c.wait()
                o_ssh[slot] = ssha
                o_ua[slot] = ua
                o_va[slot] = va
                for c in out_dmas(slot, i):
                    c.start()
            for i in (n_tiles - 2, n_tiles - 1):
                if i >= 0:
                    for c in out_dmas(i % 2, i):
                        c.wait()
            return

        for c in in_dmas(0, 0):
            c.start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            nslot = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_tiles)
            def _():
                for c in in_dmas(nslot, i + 1):
                    c.start()
            for c in in_dmas(slot, i):
                c.wait()

            if mode == "full":
                ssha, ua, va = step_math(
                    w_ssh[slot], w_un[slot], w_vn[slot], w_tm[slot], p, dx,
                    dy, fcor, depth, forcing=forcing_ref[0], exch_mid=None,
                    recip=_recip_exact)
            else:                       # dma: near-zero compute
                ssha = w_ssh[slot] + forcing_ref[0]
                ua = w_un[slot] + forcing_ref[0]
                va = w_vn[slot] + forcing_ref[0]

            @pl.when(i >= 2)
            def _():
                for c in out_dmas(slot, i - 2):
                    c.wait()
            o_ssh[slot] = ssha
            o_ua[slot] = ua
            o_va[slot] = va
            for c in out_dmas(slot, i):
                c.start()
            return 0

        jax.lax.fori_loop(0, n_tiles, body, 0)
        for i in (n_tiles - 2, n_tiles - 1):
            @pl.when(i >= 0)
            def _(i=i):
                for c in out_dmas(jax.lax.rem(i, 2), i):
                    c.wait()

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  any_spec, any_spec, any_spec, any_spec],
        out_specs=(any_spec, any_spec, any_spec),
        out_shape=(jax.ShapeDtypeStruct((ly, lx), dtype),) * 3,
        scratch_shapes=[
            pltpu.VMEM((2, H, lx), dtype),
            pltpu.VMEM((2, H, lx), dtype),
            pltpu.VMEM((2, H, lx), dtype),
            pltpu.VMEM((2, H, lx), jnp.int8),
            pltpu.VMEM((2, H, lx), dtype),
            pltpu.VMEM((2, H, lx), dtype),
            pltpu.VMEM((2, H, lx), dtype),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--modes", default="prod,compute",
                    help="comma list of: full,dma,compute,compute_fast,"
                         "unroll,tight,prod")
    ap.add_argument("--tys", default="64,128")
    args_cli = ap.parse_args()
    modes = args_cli.modes.split(",")
    tys = [int(t) for t in args_cli.tys.split(",")]

    N = 1024
    m = nl.build(N, N, pallas=True)
    m.set_initial_ssh(gaussian_eta(N, N, amp=0.2))
    spec = m.grid.halo_spec
    ly, lx = spec.local_ny, spec.local_nx
    print(f"local block {ly}x{lx}")
    p, dx, dy = m.p, m.grid.dx, m.grid.dy
    fcor, depth = m._fcor, m.depth
    dtype = jnp.float32

    sshn = m.sshn_t.data
    un, vn = m.un.data, m.vn.data
    tm = m._mask_codes
    f = jnp.ones((1,), dtype)

    from dl_esm_inf_tpu.ops.pallas_step import make_fused_step

    def build_call(TY, mode):
        if mode == "prod":     # the production kernel itself
            fused = make_fused_step(ly, lx, "float32", p, dx, dy, fcor,
                                    depth, tile_rows=TY)
            return lambda f_, s, u, v, tm_: fused(s, u, v, tm_, 1.0)
        var = make_variant(ly, lx, dtype, p, dx, dy, fcor, depth, TY, mode)
        return lambda f_, s, u, v, tm_: var(f_, s, u, v, tm_)

    for TY in tys:
        for mode in modes:
            Hbytes = 2 * (TY + 16) * lx * (6 * 4 + 1)
            if Hbytes > 100 * 1024 * 1024:
                continue
            try:
                call = build_call(TY, mode)
            except Exception as e:
                print(f"TY={TY:4d} {mode:8s} BUILD FAIL: {e}")
                continue

            state = [(sshn, un, vn)]

            def chain(n, call=call, state=state):
                @jax.jit
                def prog(s, u, v):
                    def body(i, st):
                        return call(f, *st, tm)
                    return jax.lax.fori_loop(0, n, body, (s, u, v))

                def run():
                    # feed state forward: identical repeated requests
                    # may be deduplicated by the tunnel
                    state[0] = prog(*state[0])
                    _ = float(state[0][0][16, 16])
                return run
            try:
                t = slope_time(chain)
                print(f"TY={TY:4d} {mode:8s} {t*1e6:8.1f} us/step")
            except Exception as e:
                print(f"TY={TY:4d} {mode:8s} RUN FAIL: "
                      f"{type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
