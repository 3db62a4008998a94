#!/usr/bin/env python
"""Flagship domain-size sweep on the chip (1024/2048/4096 squared).

Slope-timed (two chain lengths), interleaved across sizes each round
(CLAUDE.md timing rules: time-shared chip, adjacent configs only,
unique inputs per call).  This sweep caught the round-4 tile-model
regression: TY=344 at lx=2176 compiled into a 115.35 MB Mosaic
scoped-VMEM allocation against the 100 MB limit — exercising the
PRODUCTION widths the 1024-square bench and the small-grid tests
never touch is the point of running it each time tile policy changes.

Usage: python scripts/sizes_bench.py [--sizes 1024,2048,4096] [--rounds 5]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from dl_esm_inf_tpu.utils import compilation_cache  # noqa: E402

compilation_cache.enable()

from dl_esm_inf_tpu.models import nemolite2d as nl  # noqa: E402
from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta  # noqa: E402


def make(N):
    m = nl.build(N, N, pallas=True, steps_per_sweep=4)
    m.set_initial_ssh(gaussian_eta(N, N, amp=0.2))
    state = [(m.sshn_t.data, m.un.data, m.vn.data)]
    seq = iter(range(10 ** 6))
    runs = {}
    n_pair = (50, 250) if N >= 4096 else (100, 600)
    for n in n_pair:
        prog = m.step_program(n)

        def run(prog=prog):
            state[0] = prog(jnp.int32(next(seq)), state[0],
                            m._mask_codes)
            _ = float(state[0][0][16, 16])

        run()                       # compile + warm
        runs[n] = run
    return runs, n_pair


def slope(runs, n_pair, reps=3):
    best = {}
    for n in n_pair:
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            runs[n]()
            b = min(b, time.perf_counter() - t0)
        best[n] = b
    return (best[n_pair[1]] - best[n_pair[0]]) / (n_pair[1] - n_pair[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024,2048,4096")
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    models = {N: make(N) for N in sizes}
    bests = {N: float("inf") for N in models}
    for r in range(args.rounds):
        line = []
        for N, (runs, np_) in models.items():
            t = slope(runs, np_)
            # physical floor, like bench.py's: a K=4 sweep moves
            # ~26.6/4 B/pt; slopes below that (incl. <= 0) are
            # tenancy-shift artifacts, never real
            floor = N * N * (26.6 / 4) / 1e12
            if t >= floor:
                bests[N] = min(bests[N], t)
                line.append(f"{N}: {t * 1e6:7.1f} us/step "
                            f"({N * N / t / 1e9:5.1f} Gpt/s)")
            else:
                line.append(f"{N}: <corrupt slope {t * 1e6:.1f} us>")
        print(f"round {r}: " + "  ".join(line), flush=True)
    print("BEST: " + "  ".join(
        (f"{N}={bests[N] * 1e6:.1f}us "
         f"({N * N / bests[N] / 1e9:.1f} Gpt/s)")
        if bests[N] != float("inf") else f"{N}=<no clean sample>"
        for N in bests))


if __name__ == "__main__":
    main()
