#!/usr/bin/env python
"""Run the chip-oracle scripts and commit their evidence as one JSON
artifact (round-3 verdict #2: the compiled remote-DMA / fused-schedule /
nesting / fence claims must be driver-checkable files, not prose).

Runs, sequentially (never share the chip between programs):

* ``scripts/tpu_oracles.py``  — functional parity + COMPILED remote-DMA
  transports, fused schedules, PSy flagship, tracer sweeps, nesting;
* ``scripts/fence_oracle.py`` — adversarial fence accounting, incl. the
  deadlock-expected negative leg;
* ``scripts/f64_oracle.py``   — the 1024-step float64 golden on chip
  (skippable with ``--no-f64``; it also refreshes its own
  ``scripts/f64_oracle.out.json``).

Each child runs unbuffered; every ``... OK (...)`` line is timestamped
as it arrives, giving per-leg wall times without instrumenting the
oracles.  Writes ``ORACLES_r{NN}.json`` (``--out`` to override) and
exits non-zero if any script failed.

Usage:  python scripts/run_oracles.py [--out PATH] [--no-f64]
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

#: "checksum oracle        OK (U/V/T/F == 1200)" -> name + detail
_LEG_RE = re.compile(r"^(.*?)\s{2,}(OK|FAIL|INCONCLUSIVE)\b[:\s]*(.*)$")


def run_script(path, timeout, require_legs=True):
    """Run one oracle script unbuffered, timestamping each leg line.

    The child's stdout goes to a FILE polled with a hard deadline (a
    blocking ``for line in proc.stdout`` would hang the runner forever
    on the documented failure mode — an axon tunnel outage blocks
    backend init indefinitely — and the artifact would never be
    written); on deadline the child is killed and the partial legs are
    still recorded."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO, os.path.join(os.path.dirname(REPO), ".axon_site")]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    t0 = time.monotonic()
    out_path = path + ".runlog"
    outf = open(out_path, "w")
    proc = subprocess.Popen([sys.executable, "-u", path],
                            stdout=outf, stderr=subprocess.STDOUT,
                            text=True, env=env)
    legs, lines, t_prev = [], [], t0
    rc = None
    with open(out_path, "r") as rf:
        buf = ""
        while True:
            chunk = rf.read()
            if chunk:
                buf += chunk
                *done, buf = buf.split("\n")
                for line in done:
                    lines.append(line)
                    print(f"  | {line}", flush=True)
                    m = _LEG_RE.match(line)
                    if m:
                        now = time.monotonic()
                        legs.append({"name": m.group(1).strip(),
                                     "ok": m.group(2) == "OK",
                                     "detail": m.group(3).strip("() "),
                                     "seconds": round(now - t_prev, 1)})
                        t_prev = now
                continue           # drain before sleeping/deciding
            if proc.poll() is not None:
                rc = proc.returncode
                break
            if time.monotonic() - t0 > timeout:
                proc.kill()
                proc.wait()
                rc = -9
                lines.append(f"<runner timeout after {timeout}s>")
                print(f"  | <runner timeout after {timeout}s — killed>",
                      flush=True)
                break
            time.sleep(2)
    outf.close()
    os.unlink(out_path)
    return {
        "ok": (rc == 0 and all(l["ok"] for l in legs)
               and (bool(legs) or not require_legs)),
        "returncode": rc,
        "seconds": round(time.monotonic() - t0, 1),
        "legs": legs,
        "tail": lines[-3:],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "ORACLES_r05.json"))
    ap.add_argument("--no-f64", action="store_true",
                    help="skip the (long) float64 golden oracle")
    args = ap.parse_args()

    scripts = [("tpu_oracles", "tpu_oracles.py", 1500, True),
               ("fence_oracle", "fence_oracle.py", 900, True)]
    if not args.no_f64:
        # success = exit 0 (it emits its own scripts/f64_oracle.out.json
        # rather than per-leg OK lines)
        scripts.append(("f64_oracle", "f64_oracle.py", 1500, False))

    report = {"generated_unix": int(time.time()), "scripts": {}}
    for name, fname, tmo, req in scripts:
        print(f"== {name} ==", flush=True)
        report["scripts"][name] = run_script(
            os.path.join(HERE, fname), tmo, require_legs=req)
    report["ok"] = all(s["ok"] for s in report["scripts"].values())

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"{'ALL ORACLE SCRIPTS PASS' if report['ok'] else 'FAILURES'}"
          f" -> {args.out}")
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
