"""Global reductions and gathers.

Analogues of the reference's collective layer:
``global_sum`` (parallel_utils_mod.f90:230-238 — in-place MPI_allreduce of
one scalar) and ``gather`` (parallel_utils_mod.f90:242-255 — MPI_Gather of
equal-size buffers).

Because fields are single (sharded) ``jax.Array``s, reductions are just
jnp reductions — XLA inserts the cross-device collective (psum over ICI)
when the input is sharded.  The serial/distributed duality of the
reference's stub backend (parallel_utils_stub_mod.f90:148-161) is
automatic: on a 1-device mesh the same program contains no collectives.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import kinds


@functools.lru_cache(maxsize=16)
def _reduce_fn(op: str, acc_dtype_str: str):
    acc = jnp.dtype(acc_dtype_str)
    ops = {"sum": jnp.sum, "min": jnp.min, "max": jnp.max}
    fn = ops[op]

    @jax.jit
    def f(data):
        return fn(data.astype(acc))
    return f


def global_sum(data) -> float:
    """Scalar sum over a (possibly sharded) array (reference global_sum)."""
    return float(_reduce_fn("sum", str(kinds.sum_dtype()))(data))


def global_min(data) -> float:
    """Global minimum (metadata GO_MIN, argument_mod.f90:45)."""
    return float(_reduce_fn("min", str(kinds.sum_dtype()))(data))


def global_max(data) -> float:
    """Global maximum (metadata GO_MAX, argument_mod.f90:45)."""
    return float(_reduce_fn("max", str(kinds.sum_dtype()))(data))


@functools.lru_cache(maxsize=16)
def _masked_sum_fn(acc_dtype_str: str):
    acc = jnp.dtype(acc_dtype_str)

    @jax.jit
    def f(d, m):
        return jnp.sum(d.astype(acc) * m.astype(acc))
    return f


def masked_sum(data, mask) -> float:
    """Sum of ``data`` where ``mask`` is nonzero, accumulated in the

    checksum dtype.  The building block of field_checksum.  The jitted
    reducer is cached per accumulation dtype (a fresh closure per call
    would retrace and recompile every time)."""
    return float(_masked_sum_fn(str(kinds.sum_dtype()))(data, mask))


def gather_to_host(data):
    """Full host copy of a sharded array (reference gather,

    parallel_utils_mod.f90:242-255 + reassembly).  Single-process:
    jax.device_get performs the device->host gather.  MULTI-PROCESS
    (jax.distributed across hosts): a process can only fetch its own
    shards, so the cross-process all-gather rides
    ``multihost_utils.process_allgather`` — every process receives the
    full array (the reference gathers to rank 0 only; giving it to all
    is the multi-controller idiom)."""
    import numpy as np
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(data,
                                                            tiled=True))
    return np.asarray(jax.device_get(data))
