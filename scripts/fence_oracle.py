#!/usr/bin/env python
"""Adversarial fence-accounting oracles on the REAL chip.

The remote-DMA phase fence (parallel/rdma.py::make_fence) is the
highest-risk code that one chip cannot exercise under real multi-device
skew.  These oracles attack its two load-bearing properties with
COMPILED kernels on the single device (signals to self execute the same
semaphore hardware ops as signals to a peer):

* POSITIVE — counting semantics buffer arbitrary multi-call skew: a
  kernel burst-signals TWO invocations' worth of every (phase,
  direction) slot up front (the worst legal skew: a fast peer two
  fences ahead, phases arriving before any wait), then consumes them
  across two in-order invocation rounds with data writes guarded by
  each wait.  Mis-accounting deadlocks (caught by the timeout) or
  corrupts the output (caught by the value check).

* NEGATIVE — a wait can ONLY be satisfied by its own (phase,
  direction): a kernel signals every OTHER slot and then waits on
  phase-0/minus.  The correct implementation deadlocks; the round-1
  fence-aliasing bug — phases sharing a semaphore — would let the
  wait complete (in <2 s) and the subprocess exit cleanly, failing
  the oracle.  The subprocess prints a marker after its warm-up
  compile so a slow tunnel compile cannot masquerade as the deadlock.
  PASS evidence, either form: the armed child is still blocked when
  the parent's window closes (the parent kills it), OR the tunnel's
  TPU-worker watchdog kills the hung program first (measured on this
  image, ~60-90 s: the child dies with UNAVAILABLE "worker crashed or
  restarted") after the wait demonstrably held >= 45 s.  A child that
  dies in under 45 s proves nothing (tenancy/tunnel drop) and the leg
  is INCONCLUSIVE.

Usage:  python scripts/fence_oracle.py            # both oracles
        python scripts/fence_oracle.py --negative # (internal) child
"""
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROWS, COLS = 8, 128


def _build(kernel_body):
    """(compile_fn, run_fn): AOT compile is separate from execution so
    the negative child can prove 'compiled' before arming the
    deadlock."""
    import jax
    from dl_esm_inf_tpu.utils import compilation_cache
    compilation_cache.enable()
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))

    call = pl.pallas_call(
        kernel_body,
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), np.float32),
        scratch_shapes=[pltpu.SemaphoreType.REGULAR((2, 2))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    fn = jax.jit(jax.shard_map(call, mesh=mesh, in_specs=P(),
                               out_specs=P(), check_vma=False))
    state = {}

    def compile_fn(x):
        xd = jax.device_put(x, NamedSharding(mesh, P()))
        state["c"] = fn.lower(xd).compile()
        state["x"] = xd

    def run(x=None):
        if "c" not in state:
            compile_fn(x)
        return np.asarray(state["c"](state["x"]))

    return compile_fn, run


def _sig(pltpu, ready, ph, d, n):
    pltpu.semaphore_signal(ready.at[ph, d], inc=n,
                           device_id=0,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)


def positive_oracle():
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref, ready):
        # worst legal skew: every slot signalled two invocations ahead
        for ph in (0, 1):
            for d in (0, 1):
                _sig(pltpu, ready, ph, d, 2)
        # two in-order invocation rounds consume them exactly
        for rnd in (0, 1):
            pltpu.semaphore_wait(ready.at[0, 0], 1)
            pltpu.semaphore_wait(ready.at[0, 1], 1)
            o_ref[4 * rnd + 0, :] = x_ref[4 * rnd + 0, :] + (4 * rnd + 1)
            o_ref[4 * rnd + 1, :] = x_ref[4 * rnd + 1, :] + (4 * rnd + 2)
            pltpu.semaphore_wait(ready.at[1, 0], 1)
            pltpu.semaphore_wait(ready.at[1, 1], 1)
            o_ref[4 * rnd + 2, :] = x_ref[4 * rnd + 2, :] + (4 * rnd + 3)
            o_ref[4 * rnd + 3, :] = x_ref[4 * rnd + 3, :] + (4 * rnd + 4)

    _, run = _build(kernel)
    x = np.arange(ROWS * COLS, dtype=np.float32).reshape(ROWS, COLS)
    got = run(x)
    want = x + np.arange(1, ROWS + 1, dtype=np.float32)[:, None]
    np.testing.assert_array_equal(got, want)
    print("fence POSITIVE oracle  OK (2-invocation burst skew consumed "
          "in order)", flush=True)


def negative_child():
    """Deadlock expected: phase-0/minus wait with every OTHER slot
    signalled.  AOT-compiles first and only then prints the ARMED
    marker, so the parent can tell 'still compiling' from 'correctly
    deadlocked'."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref, ready):
        o_ref[...] = x_ref[...]
        _sig(pltpu, ready, 0, 1, 1)   # phase 0, plus side
        _sig(pltpu, ready, 1, 0, 1)   # phase 1, both sides
        _sig(pltpu, ready, 1, 1, 1)
        pltpu.semaphore_wait(ready.at[0, 0], 1)   # nobody signals this
        o_ref[0, :] = jnp.full((COLS,), -1.0, jnp.float32)  # never runs

    compile_fn, run = _build(kernel)
    compile_fn(np.zeros((ROWS, COLS), np.float32))
    print("NEGATIVE ARMED", flush=True)
    t_arm = time.time()
    try:
        run()
    except Exception as e:  # noqa: BLE001 — the watchdog kill arrives
        # as a runtime error; how LONG the wait held is the evidence
        blocked = time.time() - t_arm
        print(f"NEGATIVE KILLED after {blocked:.0f}s "
              f"({type(e).__name__}: {str(e)[:120]})", flush=True)
        sys.exit(1)
    print("NEGATIVE COMPLETED (aliasing!)", flush=True)


def _poll_output(path, proc, markers, deadline):
    """Wait for any of ``markers`` in the child's output file (or child
    exit); returns (marker_or_None, output).  The final read after an
    exit is re-scanned: a marker printed just before a fast exit must
    not be lost."""
    def scan(out):
        for m in markers:
            if m in out:
                return m
        return None

    while time.time() < deadline:
        out = open(path).read()
        m = scan(out)
        if m:
            return m, out
        if proc.poll() is not None:
            out = open(path).read()
            return scan(out), out
        time.sleep(5)
    out = open(path).read()
    return scan(out), out


def main():
    if "--negative" in sys.argv:
        negative_child()
        return
    positive_oracle()

    t0 = time.time()
    out_path = os.path.join(os.path.dirname(__file__),
                            ".fence_negative.out")
    with open(out_path, "w") as f:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--negative"],
            stdout=f, stderr=subprocess.STDOUT, text=True)
    try:
        m, out = _poll_output(out_path, proc,
                              ["NEGATIVE ARMED", "NEGATIVE COMPLETED"],
                              time.time() + 330)
        if m is None:
            print(out[-1500:])
            print("fence NEGATIVE oracle  INCONCLUSIVE: child "
                  "exited/stalled before arming (tunnel compile?)")
            sys.exit(1)
        # armed with the kernel COMPILED: completion now can only mean
        # the wait was wrongly released.  Give it a generous window.
        m, out = _poll_output(out_path, proc,
                              ["NEGATIVE COMPLETED", "NEGATIVE KILLED"],
                              time.time() + 150)
        if m == "NEGATIVE COMPLETED" or proc.poll() == 0:
            print(out[-1500:])
            print("fence NEGATIVE oracle  FAIL: a phase-0 wait was "
                  "released by other-slot signals (aliasing)")
            sys.exit(1)
        if m == "NEGATIVE KILLED":
            # the tunnel's TPU-worker watchdog killed the hung program
            # (~60-90 s on this image).  The aliasing bug completes in
            # <2 s, so a wait that demonstrably HELD >= 45 s before the
            # kill is the deadlock — same evidence the parent-kill path
            # records, delivered by the watchdog instead.
            kill_re = re.search(r"NEGATIVE KILLED after (\d+)s", out)
            blocked = int(kill_re.group(1)) if kill_re else -1
            if blocked >= 45:
                print(f"fence NEGATIVE oracle  OK (armed wait blocked "
                      f"{blocked}s until the TPU-worker watchdog killed "
                      f"the hung program — deadlock confirmed)")
            else:
                print(out[-1500:])
                print(f"fence NEGATIVE oracle  INCONCLUSIVE: armed "
                      f"child died after only {blocked}s (tenancy/"
                      "tunnel drop, not a held wait) — rerun")
                sys.exit(1)
        elif proc.poll() is not None:
            # crashed (tenancy conflict, tunnel drop, ...) rather than
            # blocked on the wait: proves nothing either way
            print(out[-1500:])
            print(f"fence NEGATIVE oracle  INCONCLUSIVE: armed child "
                  f"exited with {proc.returncode} instead of "
                  "deadlocking — rerun")
            sys.exit(1)
        else:
            print(f"fence NEGATIVE oracle  OK (armed wait deadlocked "
                  f"as required; killed after {time.time() - t0:.0f}s)")
    finally:
        if proc.poll() is None:
            proc.kill()
    print("ALL FENCE ORACLES PASS")


if __name__ == "__main__":
    main()
