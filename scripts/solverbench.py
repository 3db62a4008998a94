#!/usr/bin/env python
"""On-chip solver benchmark: CG vs Chebyshev Helmholtz solves (real v5e).

Measures per-solve wall time and per-iteration cost of the in-step
elliptic solvers at 1024x1024 f32 (the flagship scale) plus the
semi-implicit model's step rate.  Single-chip numbers measure VPU/HBM
cost only — the collective-economics advantage of Chebyshev
(doc/performance.md) needs a real mesh.

Timing rules (memory: axon-tpu-quirks): vary inputs on EVERY timed
call (the tunnel dedups identical requests), compare only adjacently
interleaved variants, best-of over repeats.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.core import layout
from dl_esm_inf_tpu.models import semi_implicit as si
from dl_esm_inf_tpu.ops.solvers import HelmholtzSolver


def main():
    import sys
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    lam = 50.0          # ~ g*H*(theta*dt)^2/dx^2 for a stiff implicit step
    tmask = np.ones((N, N), np.int32)
    tmask[0, :] = tmask[-1, :] = 0
    tmask[:, 0] = tmask[:, -1] = 0
    rng = np.random.default_rng(0)
    b0 = rng.standard_normal((N, N)).astype(np.float32) * (tmask == 1)

    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(N, N)
    dl.grid_init(grid, 1.0, 1.0, tmask)

    solvers = {
        "cg": HelmholtzSolver(grid, lam, lam),
        "chebyshev": HelmholtzSolver(grid, lam, lam, method="chebyshev"),
    }
    if jax.default_backend() != "cpu":
        # fused-sweep variant needs a TPU-tile-aligned grid
        gridp = dl.Grid(dl.ARAKAWA_C,
                        (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                        dl.OFFSET_NE)
        gridp.decompose(N, N, halo_width=4, align=128, align_y=8)
        dl.grid_init(gridp, 1.0, 1.0, tmask)
        solvers["chebyshev-pallas-K4"] = HelmholtzSolver(
            gridp, lam, lam, method="chebyshev", steps_per_exchange=4,
            pallas=True)
    # each solver's grid may have different padding: per-solver rhs
    flds = {k: dl.Field(s.grid, dl.T_POINTS, init_global_data=b0)
            for k, s in solvers.items()}

    # warm (compile) and grab iteration counts
    iters = {}
    for k, s in solvers.items():
        x, info = s.solve(flds[k])
        iters[k] = info["iterations"]
        print(f"warm {k}: {info}", flush=True)

    # interleaved best-of timing; a fresh scaled rhs every call
    REPS = 12
    best = {k: float("inf") for k in solvers}
    seq = iter(range(1, 10 ** 6))
    for _ in range(REPS):
        for k, s in solvers.items():
            c = 1.0 + 1e-6 * next(seq)
            b = (flds[k].data * c).block_until_ready()
            t0 = time.perf_counter()
            x, _ = s.solve(b)
            jax.block_until_ready(x)
            best[k] = min(best[k], time.perf_counter() - t0)

    out = {"grid": N, "lam": lam}
    for k in solvers:
        out[k] = {"solve_ms": round(best[k] * 1e3, 3),
                  "iterations": iters[k],
                  "us_per_iteration": round(
                      best[k] * 1e6 / max(iters[k], 1), 2)}

    # semi-implicit model step rate (CG, f32 default tol)
    m = si.build(N, N, dt=0.5, depth=10.0)
    m.set_initial_eta(si.gaussian_eta(N, N, amp=0.5))
    m.run(1)                                  # compile
    t0 = time.perf_counter()
    info = m.run(10)
    dtm = (time.perf_counter() - t0) / 10
    out["semi_implicit_step"] = {
        "ms_per_step": round(dtm * 1e3, 3),
        "cg_iterations_per_step": info["cg_iterations_per_step"]}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
