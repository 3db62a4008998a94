#!/usr/bin/env python
"""Temporal-blocking / tile-size sweep for the fused NEMOLite2D step.

Usage: sweepk.py [--ks]      (default: K x TY matrix, interleaved twice)

Timing feeds state forward and varies istep0 so no two requests are
identical (the tunnel may deduplicate repeats); only adjacent rows are
comparable (time-shared chip — see memory: axon-tpu-quirks).
"""
import sys
import time

import jax.numpy as jnp

from dl_esm_inf_tpu.models import nemolite2d as nl
from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta

N = 1024


def slope(m, n_lo=100, n_hi=600):
    state = [(m.sshn_t.data, m.un.data, m.vn.data)]
    seq = iter(range(10 ** 6))
    ts = {}
    for n in (n_lo, n_hi):
        prog = m.step_program(n)

        def run():
            state[0] = prog(jnp.int32(next(seq)), state[0], m._mask_codes)
            _ = float(state[0][0][16, 16])
        run()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); run()
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)


configs = [(4, 64), (4, 80), (4, 64), (4, 80)]
if len(sys.argv) > 1 and sys.argv[1] == "--ks":
    configs = [(1, None), (2, None), (4, None), (2, None), (1, None)]

for K, ty in configs:
    m = nl.build(N, N, pallas=True, steps_per_sweep=K)
    if ty:
        m.enable_pallas(steps_per_sweep=K, tile_rows=ty)
    m.set_initial_ssh(gaussian_eta(N, N, amp=0.2))
    t = slope(m)
    print(f"K={K} TY={ty or 64:4}  {t*1e6:7.1f} us/step  "
          f"{N*N/t/1e9:6.2f} Gpt/s", flush=True)
