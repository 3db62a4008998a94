#!/usr/bin/env python
"""PSy fused-tier chip measurement (round-4 verdict #5).

Runs bench.py's measure_psy_fused standalone: the metadata-driven
fused flagship (Schedule.fused_program, repeats=max_fused_repeats)
at 1024², slope-timed.  Compare against the hand-fused headline in an
ADJACENT bench/sizes run — the chip is time-shared (CLAUDE.md).

Usage: python scripts/psybench.py [budget_s]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from dl_esm_inf_tpu.utils import compilation_cache  # noqa: E402

compilation_cache.enable()

import jax.numpy as jnp  # noqa: E402

from bench import measure_psy_fused  # noqa: E402


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
    t0 = time.monotonic()
    out = measure_psy_fused(jax, jnp, deadline=t0 + budget)
    print({"psy_fused_flagship": out,
           "elapsed_s": round(time.monotonic() - t0, 1)}, flush=True)


if __name__ == "__main__":
    main()
