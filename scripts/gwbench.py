#!/usr/bin/env python
"""Gravity-wave sweep-engine throughput on one chip (K in {1,4,8})."""
import time

from dl_esm_inf_tpu.models import gravity_wave as gw

N = 1024

def slope(m, n_lo=100, n_hi=600):
    # feed state forward between calls: no two requests identical
    # (the tunnel may deduplicate repeats)
    state = [(m.eta.data, m.u.data, m.v.data)]
    aux = (m._t_upd, m._u_wet, m._v_wet, m._mask_codes)
    ts = {}
    for n in (n_lo, n_hi):
        prog = m.step_program(n)

        def run():
            state[0] = prog(*state[0], *aux)
            _ = float(state[0][0][16, 16])
        run()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); run()
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)

for K in (1, 4, 8):
    m = gw.build(N, N, dt=0.005, pallas=True, steps_per_sweep=K)
    m.set_initial_eta(gw.gaussian_eta(N, N, amp=0.1))
    t = slope(m)
    print(f"K={K}  {t*1e6:7.1f} us/step  {N*N/t/1e9:6.2f} Gpt/s", flush=True)
