#!/usr/bin/env python
"""Interleaved A/B: decode masks once per tile vs per sub-step (K=4)."""
import time

import jax
import jax.numpy as jnp

from dl_esm_inf_tpu.models import nemolite2d as nl
from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta
from dl_esm_inf_tpu.ops import pallas_step as ps

N = 1024
m = nl.build(N, N, pallas=True, steps_per_sweep=4)
m.set_initial_ssh(gaussian_eta(N, N, amp=0.2))
spec = m.grid.halo_spec
args = (spec.local_ny, spec.local_nx, "float32", m.p, m.grid.dx, m.grid.dy,
        m._fcor, m.depth)

# variant A: hoisted decode; variant B: per-step decode
fa = ps.make_fused_step(*args, steps_per_sweep=4)

state0 = (m.sshn_t.data, m.un.data, m.vn.data)
tm = m._mask_codes
f4 = jnp.ones((4,), jnp.float32)


def timer(fused):
    def chain(n):
        @jax.jit
        def prog(s, u, v):
            def body(i, st):
                return fused(*st, tm, f4)
            return jax.lax.fori_loop(0, n, body, (s, u, v))

        def run():
            out = prog(*state0)
            _ = float(out[0][16, 16])
        return run
    lo, hi = chain(25), chain(125)
    lo(); hi()
    def best(g):
        b = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); g(); b = min(b, time.perf_counter()-t0)
        return b
    return (best(hi) - best(lo)) / 100 / 4   # per step (K=4)


# Build variant B by flipping the hoist flag
fb = ps.make_fused_step(*args, steps_per_sweep=4, hoist_masks=False)

for rep in range(3):
    ta = timer(fa)
    tb = timer(fb)
    print(f"rep{rep}: hoist={ta*1e6:6.1f} us/step   per-step={tb*1e6:6.1f} us/step",
          flush=True)
