#!/bin/bash
# Drive every real-chip verification leg in sequence (after a tunnel
# outage): functional oracles, fence oracles, solver bench, headline
# bench.  Each leg gets its own timeout and log; a failing leg does not
# stop the later ones.  Run from the repo root.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/chip_catchup}
mkdir -p "$LOG"
echo "== chip catchup $(date +%F\ %T) -> $LOG =="

run() {
  name=$1; tmo=$2; shift 2
  echo "-- $name ($(date +%H:%M:%S), timeout ${tmo}s)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -3 "$LOG/$name.log" | sed "s/^/   /"
  echo "-- $name rc=$rc"
}

run oracles     900 python scripts/tpu_oracles.py
run fence       590 python scripts/fence_oracle.py
run f64         900 python scripts/f64_oracle.py
run solverbench 900 python scripts/solverbench.py
run bench       900 python bench.py
echo "== done $(date +%H:%M:%S) =="
