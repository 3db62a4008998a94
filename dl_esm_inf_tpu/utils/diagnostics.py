"""Physical diagnostics for shallow-water clients.

The reference library's only diagnostic is the checksum
(field_mod.f90:1289-1307); a production ESM framework also monitors
conserved quantities and stability margins.  All reductions here are
masked internal-point sums/maxima — XLA inserts the cross-device
collectives exactly as for checksum().
"""
from __future__ import annotations

from ..core.field import Field


def volume(eta: Field, dx: float, dy: float) -> float:
    """∫ eta dA over internal points (mass anomaly per unit rho)."""
    return eta.integral() * dx * dy


def potential_energy(eta: Field, g: float, dx: float, dy: float) -> float:
    """0.5 g ∫ eta² dA (available PE of the free surface)."""
    import jax.numpy as jnp
    from ..parallel.collectives import masked_sum
    return 0.5 * g * masked_sum(jnp.square(eta.data),
                                eta.internal_mask) * dx * dy


def kinetic_energy(u: Field, v: Field, depth: float, dx: float,
                   dy: float) -> float:
    """0.5 H ∫ (u² + v²) dA (depth-integrated KE, flat bottom)."""
    import jax.numpy as jnp
    from ..parallel.collectives import masked_sum
    ke = (masked_sum(jnp.square(u.data), u.internal_mask)
          + masked_sum(jnp.square(v.data), v.internal_mask))
    return 0.5 * depth * ke * dx * dy


def cfl_number(u: Field, v: Field, dt: float, dx: float, dy: float,
               g: float = 9.81, depth: float | None = None) -> float:
    """Advective (+ optional gravity-wave) Courant number.

    Stability of the forward-backward SW schemes requires roughly
    cfl < 1 with the gravity-wave term included."""
    adv = u.max_abs() * dt / dx + v.max_abs() * dt / dy
    if depth is not None:
        import math
        c = math.sqrt(g * depth)
        adv += c * dt * math.sqrt(1.0 / dx ** 2 + 1.0 / dy ** 2)
    return adv
