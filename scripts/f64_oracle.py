#!/usr/bin/env python
"""fp64 on the actual TPU: the hardware leg of the precision story.

The reference is fp64 everywhere (kind_params_mod.f90:9) and
BASELINE.md's first target is "fp64 allclose after 1024 steps".  The
pytest suite proves that on x64 CPU meshes; this script executes the
float64 jnp path on the REAL chip and records what XLA:TPU actually
does with it (execute-with-emulation / reject / downcast):

* probe: dtype and value fidelity of a device computation whose result
  is unrepresentable in f32 (1 + 2^-40);
* flagship oracle: NEMOLite2D at float64 for 1024 steps on the chip,
  pinned against the independent NumPy golden at jnp-path tolerances;
* cost: per-step slope timing of the same compiled program at f64 vs
  f32, so doc/performance.md can state the measured slowdown.

Writes scripts/f64_oracle.out.json and prints a summary; exit 0 = the
fp64 row has a hardware cell (either outcome is recorded — an honest
rejection also closes the gap).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def slope_time(run, n_lo, n_hi, reps=3):
    """Per-step time via the two-chain slope method (CLAUDE.md timing
    rules: unique inputs per call are the caller's job)."""
    best = {}
    for n in (n_lo, n_hi):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(n)
            b = min(b, time.perf_counter() - t0)
        best[n] = b
    return (best[n_hi] - best[n_lo]) / (n_hi - n_lo)


def main():
    import jax
    from dl_esm_inf_tpu.utils import compilation_cache
    compilation_cache.enable()
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    out = {"backend": jax.default_backend()}
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    # --- probe: does the chip execute real f64? -----------------------
    tiny = 2.0 ** -40            # vanishes in f32 (eps ~ 1.2e-7)
    try:
        x = jnp.asarray([1.0], dtype=jnp.float64)
        y = (x + tiny) - x
        got = float(y[0])
        executes = jnp.dtype(y.dtype) == jnp.dtype(jnp.float64)
        faithful = got == tiny
        out["probe"] = {"executes": bool(executes),
                        "result_dtype": str(y.dtype),
                        "faithful_2pow40": bool(faithful)}
        print(f"f64 probe: dtype={y.dtype}, (1+2^-40)-1 = {got!r} "
              f"({'faithful' if faithful else 'DOWNCAST/LOSSY'})")
    except Exception as e:  # noqa: BLE001 — record the rejection
        out["probe"] = {"executes": False, "error": repr(e)[:400]}
        print(f"f64 probe: REJECTED: {e!r}")
        _write(out)
        return

    if not (out["probe"]["executes"] and out["probe"]["faithful_2pow40"]):
        _write(out)
        return

    # --- flagship oracle: 1024 f64 steps on the chip vs NumPy golden --
    from dl_esm_inf_tpu.core import kinds
    from dl_esm_inf_tpu.models import nemolite2d as nl
    from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta
    from nemolite2d_golden import golden_run

    kinds.set_working_precision("float64")
    gnx, gny, nsteps = 66, 48, 1024
    m = nl.build(gnx, gny, ndomains=1)
    assert str(m.sshn_t.data.dtype) == "float64", m.sshn_t.data.dtype
    ssh0 = gaussian_eta(gnx, gny, amp=0.2)
    m.set_initial_ssh(ssh0)
    t0 = time.perf_counter()
    m.run(nsteps)
    wall = time.perf_counter() - t0
    got = m.gather()
    want = golden_run(nl.default_tmask(gnx, gny, True), ssh0, nsteps,
                      m.p, m.grid.dx, m.grid.dy, 100.0)
    ok = True
    worst = 0.0
    for k in ("sshn", "un", "vn"):
        a, b = got[k], want[k]
        assert np.all(np.isfinite(a)), k
        denom = np.maximum(np.abs(b), 1e-30)
        rel = float(np.max(np.abs(a - b) / denom))
        worst = max(worst, rel)
        try:
            np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)
        except AssertionError:
            ok = False
    out["golden_1024"] = {"grid": [gnx, gny], "steps": nsteps,
                          "allclose_rtol1e-8": ok,
                          "max_rel_err": worst,
                          "wall_s": round(wall, 2)}
    print(f"golden 1024-step f64 oracle on chip: "
          f"{'PASS' if ok else 'FAIL'} (max rel err {worst:.3e}, "
          f"{wall:.1f}s wall)")

    # --- cost: f64 vs f32 per-step time, same program shape -----------
    # 258^2 jnp path; unique istep0 per call defeats tunnel dedup.
    # The two dtypes are sampled ADJACENTLY INTERLEAVED (CLAUDE.md
    # timing rules: only adjacent configs on the time-shared chip are
    # comparable), and the slowdown is the median of per-round ratios.
    # Chains are LONG (500/3000 steps): at ~10-70 us/step the slope
    # signal must tower over the tunnel's ~30-50 ms per-call RPC jitter
    # or the round is noise (a 10/60-step variant once measured f64
    # FASTER than f32).  Rounds are also plausibility-filtered: f32
    # above the physical HBM floor, and f64 >= f32 (f64 emulation can
    # never be faster than f32 on this VPU).
    seq = iter(range(10 ** 6))
    n_lo, n_hi = 500, 3000
    # 258^2 f32 jnp step moves >= ~25 B/pt; even at 1 TB/s anything
    # below this per-step time is a tenancy-shift artifact
    floor32 = 258 * 258 * 25 / 1e12
    runners = {}
    for name, dt in (("float64", "float64"), ("float32", "float32")):
        kinds.set_working_precision(dt)
        mm = nl.build(258, 258, ndomains=1)
        mm.set_initial_ssh(gaussian_eta(258, 258, amp=0.2))
        progs = {n: mm.step_program(n) for n in (n_lo, n_hi)}
        state0 = (mm.sshn_t.data, mm.un.data, mm.vn.data)

        def run(n, progs=progs, state0=state0, mm=mm):
            o = progs[n](jnp.int32(next(seq)), state0, mm._mask_codes)
            _ = float(np.asarray(o[0])[16, 16])

        run(n_lo), run(n_hi)     # compile + warm
        runners[name] = run

    rounds = []
    for _ in range(8):
        t64 = slope_time(runners["float64"], n_lo, n_hi)
        t32 = slope_time(runners["float32"], n_lo, n_hi)
        if t32 >= floor32 and t64 >= t32:
            rounds.append((t64, t32))
        if len(rounds) >= 3:
            break
    if rounds:
        ratios = sorted(t64 / t32 for t64, t32 in rounds)
        t64_m = sorted(r[0] for r in rounds)[len(rounds) // 2]
        t32_m = sorted(r[1] for r in rounds)[len(rounds) // 2]
        out["cost_258sq_jnp"] = {
            "f64_us_per_step": round(t64_m * 1e6, 1),
            "f32_us_per_step": round(t32_m * 1e6, 1),
            "slowdown": round(ratios[len(ratios) // 2], 2),
            "rounds": len(rounds)}
        print(f"f64 {t64_m * 1e6:.0f} us/step, f32 {t32_m * 1e6:.0f} "
              f"us/step, f64/f32 slowdown "
              f"{out['cost_258sq_jnp']['slowdown']}x "
              f"({len(rounds)} interleaved rounds)")
    else:
        out["cost_258sq_jnp"] = {
            "failed": "every interleaved round tenancy-corrupted"}
        print("cost measurement failed (tenancy-corrupted)")
    _write(out)
    if not ok:
        sys.exit(1)          # wrong ANSWERS are a failure; an honest
        # platform rejection (probe path) still exits 0


def _write(out):
    p = os.path.join(os.path.dirname(__file__), "f64_oracle.out.json")
    with open(p, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {p}")


if __name__ == "__main__":
    main()
