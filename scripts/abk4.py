#!/usr/bin/env python
"""Interleaved A/B of fused-step variants at K=4 (the headline config).

The chip is time-shared: only ADJACENT interleaved comparisons mean
anything (memory: axon-tpu-quirks), so each round times every variant
once, and we report per-variant bests across rounds plus round-by-round
ratios.  Every timed call feeds unique state forward (tunnel dedup).

Usage: python scripts/abk4.py [--tys 64,128] [--rounds 4]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from dl_esm_inf_tpu.models import nemolite2d as nl
from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta
from dl_esm_inf_tpu.ops.pallas_step import make_fused_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tys", default="64,128")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--rolls", default="hw,sw",
                    help="comma list from {hw,sw}: fewer variants = "
                         "tighter interleaved adjacency")
    args = ap.parse_args()
    tys = [int(t) for t in args.tys.split(",")]
    rolls = [r == "hw" for r in args.rolls.split(",")]

    N = args.n
    K = 4
    m = nl.build(N, N, pallas=True, steps_per_sweep=K)
    m.set_initial_ssh(gaussian_eta(N, N, amp=0.2))
    spec = m.grid.halo_spec
    ly, lx = spec.local_ny, spec.local_nx
    print(f"block {ly}x{lx}, K={K}")
    p, dx, dy = m.p, m.grid.dx, m.grid.dy
    fcor, depth = m._fcor, m.depth
    tm = m._mask_codes
    f4 = jnp.arange(1, K + 1, dtype=jnp.float32).reshape(K, 1) * 1e-3

    variants = {}
    for ty in tys:
        for hw in rolls:
            name = f"TY{ty}-{'hw' if hw else 'sw'}roll"
            fused = make_fused_step(ly, lx, "float32", p, dx, dy, fcor,
                                    depth, tile_rows=ty, steps_per_sweep=K,
                                    hardware_rolls=hw)
            variants[name] = fused

    n_lo, n_hi = 25, 125           # sweeps per chain (x4 steps each)
    progs = {}
    for name, fused in variants.items():
        def mk(n, fused=fused):
            @jax.jit
            def prog(s, u, v):
                def body(i, st):
                    return fused(st[0], st[1], st[2], tm, f4)
                return jax.lax.fori_loop(0, n, body, (s, u, v))
            return prog
        progs[name] = (mk(n_lo), mk(n_hi))

    state = {name: (m.sshn_t.data, m.un.data, m.vn.data)
             for name in variants}

    def timed(name, which):
        prog = progs[name][which]
        t0 = time.perf_counter()
        out = prog(*state[name])
        _ = float(out[0][16, 16])
        state[name] = out
        return time.perf_counter() - t0

    # compile + warm all
    for name in variants:
        timed(name, 0), timed(name, 1)

    best = {name: float("inf") for name in variants}
    for r in range(args.rounds):
        line = []
        for name in variants:
            lo = min(timed(name, 0) for _ in range(2))
            hi = min(timed(name, 1) for _ in range(2))
            us = (hi - lo) / ((n_hi - n_lo) * K) * 1e6
            best[name] = min(best[name], us)
            line.append(f"{name}={us:6.1f}")
        print(f"round {r}: " + "  ".join(line), flush=True)
    print("best us/step: " +
          "  ".join(f"{k}={v:.1f}" for k, v in best.items()))


if __name__ == "__main__":
    main()
