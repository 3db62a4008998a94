"""Stencil primitives for local shard blocks.

The reference library provides no kernels — clients write Fortran loops
over ``internal`` bounds (doc/api.rst:240-337).  The TPU-native analogue:
kernels are pure jnp functions over a shard's *local block* (halo ring
included), composed inside one ``shard_map`` program per time step, so
XLA fuses the whole step into a minimal number of HBM passes.

Shifts replace index arithmetic: ``xp(a)[j, i] == a[j, i+1]``.  Because
every block carries a halo ring, shifts are local; values that wrap
around the block edge land in halo/padding cells and are never read as
results (the pad-and-mask contract).  All helpers work on any 2D array.
"""
from __future__ import annotations

import contextlib

import jax.numpy as jnp

# Roll implementation stack: jnp.roll by default; inside a Pallas TPU
# kernel the sweep engine pushes the hardware vector rotate
# (pltpu.roll), which lowers to a single Mosaic rotate instead of
# jnp.roll's slice+slice+concatenate (the step is VPU-bound, so shift
# cost is on the critical path — doc/performance.md).  Both are exact
# permutations with identical semantics, so jnp/Pallas path-equality
# tests stay bitwise.
_ROLL = [jnp.roll]


def _roll(a, shift_by: int, axis: int):
    return _ROLL[-1](a, shift_by, axis)


@contextlib.contextmanager
def hw_rolls():
    """While active, shifts use the TPU vector rotate (pltpu.roll).
    Only valid while tracing inside a Pallas TPU kernel (compiled or
    interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    def roll(a, shift_by, axis):
        axis = axis % a.ndim
        # pltpu.roll requires a non-negative shift; roll is periodic
        return pltpu.roll(a, shift_by % a.shape[axis], axis)

    _ROLL.append(roll)
    try:
        yield
    finally:
        _ROLL.pop()


def xp(a):
    """a[j, i+1] (east neighbour)."""
    return _roll(a, -1, -1)


def xm(a):
    """a[j, i-1] (west neighbour)."""
    return _roll(a, 1, -1)


def yp(a):
    """a[j+1, i] (north neighbour)."""
    return _roll(a, -1, -2)


def ym(a):
    """a[j-1, i] (south neighbour)."""
    return _roll(a, 1, -2)


def shift(a, dx: int = 0, dy: int = 0):
    """a[j+dy, i+dx]."""
    out = a
    if dy:
        out = _roll(out, -dy, -2)
    if dx:
        out = _roll(out, -dx, -1)
    return out


def ddx(a, dx: float):
    """(a[j, i+1] - a[j, i]) / dx — forward difference onto U faces."""
    return (xp(a) - a) / dx


def ddx_back(a, dx: float):
    """(a[j, i] - a[j, i-1]) / dx — backward difference onto T centres."""
    return (a - xm(a)) / dx


def ddy(a, dy: float):
    return (yp(a) - a) / dy


def ddy_back(a, dy: float):
    return (a - ym(a)) / dy


def avg_x(a):
    """0.5*(a[j,i] + a[j,i+1]) — T->U interpolation (NE offset)."""
    return 0.5 * (a + xp(a))


def avg_x_back(a):
    """0.5*(a[j,i-1] + a[j,i]) — U->T interpolation (NE offset)."""
    return 0.5 * (a + xm(a))


def avg_y(a):
    return 0.5 * (a + yp(a))


def avg_y_back(a):
    return 0.5 * (a + ym(a))


def pack_mask_bits(masks) -> jnp.ndarray:
    """Pack 0/1 masks (constant in time) into one int8 bitfield: one
    byte per point of HBM traffic instead of one float array per mask
    (roofline economics); decoded roll-free on the VPU."""
    masks = list(masks)
    if len(masks) > 8:
        raise ValueError(
            f"pack_mask_bits holds at most 8 masks in the int8 code, "
            f"got {len(masks)}; split into two codes")
    code = sum((jnp.asarray(m).astype(jnp.int32) << k)
               for k, m in enumerate(masks))
    return code.astype(jnp.int8)


def unpack_mask_bits(codes, n: int, dtype):
    """Inverse of :func:`pack_mask_bits` — shifts and ands only."""
    c = codes.astype(jnp.int32)
    return tuple(((c >> k) & 1).astype(dtype) for k in range(n))
