"""Adjoint memory management: checkpointed time loops for reverse AD.

Reverse-mode differentiation of an ``nsteps``-long time loop
(``lax.fori_loop`` with static bounds lowers to ``lax.scan``) stores
every intermediate of every step — for the flagship's ~40 temporaries
per step that is tens of state-sized arrays per step, so a
production-length assimilation window exhausts HBM long before it
exhausts compute.  The reference has no adjoint at all (hand-written
adjoints are exactly the cost this framework's differentiable design
removes); this module supplies the standard remedy from the adjoint
literature — checkpointing (Griewank's treeverse, here the two-level
form) — as a drop-in ``fori_loop`` replacement:

* per-step ``jax.checkpoint``: the saved residual of each step is its
  input carry alone; the step's internals are recomputed during the
  backward sweep (one extra forward evaluation, the classic 2x-compute
  / O(state)-memory trade);
* an optional second level (``chunk=c``): the loop runs as an outer
  scan over ``n // c`` checkpointed chunks, so the backward sweep keeps
  ``n/c`` chunk-entry carries plus, transiently, the ``c`` step carries
  of the chunk being re-run — O(n/c + c) state copies instead of O(n),
  minimised at ``c ~ sqrt(n)`` (compute cost: one more forward pass,
  3x total).

Used by the differentiable ``step_program(remat_chunk=...)`` paths of
the gravity-wave, flagship and semi-implicit models and threaded
through 4D-Var (``models/assimilation.py``).  Equality of the
checkpointed and plain gradients is pinned in ``tests/test_remat.py``.
"""
from __future__ import annotations

import jax
from jax import lax


def checkpointed_fori(n: int, body, state, chunk: int = 1):
    """``lax.fori_loop(0, n, body, state)`` with bounded adjoint memory.

    ``body`` is ``(i, state) -> state`` with ``i`` the absolute step
    index (an int32 tracer; its tangent is symbolic zero, so
    time-dependent forcing differentiates correctly).  ``n`` and
    ``chunk`` must be Python ints: the loop structure is staged out at
    trace time.  ``chunk <= 1`` gives per-step checkpointing only;
    ``chunk = c > 1`` adds the outer level described in the module
    docstring.  Forward values are bitwise identical to the plain loop
    (checkpointing changes what is *stored*, never what is computed).
    """
    n = int(n)
    if n <= 0:
        return state
    step = jax.checkpoint(body)
    chunk = max(int(chunk), 1)
    if chunk <= 1 or n <= chunk:
        return lax.fori_loop(0, n, step, state)
    nchunks, rem = divmod(n, chunk)

    @jax.checkpoint
    def chunk_body(k, s):
        # inner bounds are static -> scan; per-step checkpoints bound
        # the transient residuals of the chunk being re-run
        return lax.fori_loop(
            0, chunk, lambda j, t: step(k * chunk + j, t), s)

    state = lax.fori_loop(0, nchunks, chunk_body, state)
    if rem:
        base = nchunks * chunk
        state = lax.fori_loop(
            0, rem, lambda j, t: step(base + j, t), state)
    return state
