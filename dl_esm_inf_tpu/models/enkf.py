"""Ensemble Kalman filtering (ETKF) on the ensemble runner.

The second pillar of operational data assimilation next to 4D-Var
(``models/assimilation.py``): instead of an adjoint, the forecast
ensemble itself supplies the covariances.  The reference framework has
no batching concept at all (one ``r2d_field`` is one array,
field_mod.f90:139-166), so this workflow on the reference means M job
launches plus a hand-written MPI analysis code; here it is one program.

The ensemble transform Kalman filter (ETKF, Bishop et al. 2001; the
square-root form of Hunt et al. 2007) is TPU-native by construction:

* obs-space statistics reduce to an (M, M) matrix and an (M,) vector —
  each shard contributes its local observations via masked ``einsum``
  and one ``psum`` of O(M^2) scalars ships the lot (no observation
  gather, no state gather);
* the (M, M) eigendecomposition is replicated per device (identical
  inputs -> identical weights everywhere);
* the state update is a member-space matmul applied point-wise,
  ``X_a = x̄ + W^T X'`` over every local grid point — exactly the
  large, batched matmul the MXU wants;
* because every device applies the SAME (M, M) weights, shard-halo
  points transform exactly like their interior twins on the
  neighbouring shard — the analysis needs NO halo exchange and
  decomposition invariance is preserved bitwise-structurally
  (``tests/test_enkf.py``).

Every state field is updated with the same weights (the standard
multivariate update: cross-covariances between the observed field and
the others are implicit in the ensemble), so observing eta corrects
u and v too.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..core import layout


def _etkf_weights(S, d, m, inflation):
    """ETKF weight matrix from obs-space moments (all (M, M)/(M,)
    replicated): returns ``Wtot`` with column k the mixing weights of
    analysis member k over the forecast perturbations.

    ``S = Y'^T R^-1 Y'``, ``d = Y'^T R^-1 (y - Hx̄)``;
    ``P̃^-1 = (m-1) I / inflation + S``;
    ``w̄ = P̃ d``; ``W_a = sqrt(m-1) P̃^(1/2)``; ``Wtot = w̄ 1^T + W_a``.
    """
    dtype = S.dtype
    eye = jnp.eye(m, dtype=dtype)
    pinv = (m - 1) / inflation * eye + S
    lam, q = jnp.linalg.eigh(pinv)
    # pinv is SPD by construction ((m-1)/rho > 0, S PSD); clamp anyway
    # so a degenerate ensemble cannot emit NaNs
    lam = jnp.maximum(lam, jnp.asarray(1e-30, dtype))
    p_tilde = (q / lam) @ q.T
    w_mean = p_tilde @ d
    w_anom = jnp.sqrt(jnp.asarray(m - 1, dtype)) * ((q / jnp.sqrt(lam))
                                                    @ q.T)
    return w_mean[:, None] + w_anom


class ETKF:
    """Ensemble transform Kalman filter over an ``Ensemble``.

    ``obs_field`` names the observed state field (default the first,
    the surface elevation in every adapter).  Observations arrive as a
    global ``(gny, gnx)`` value array plus a 0/1 mask of observed
    points (default: every wet internal point), with independent error
    std ``sigma``; ``inflation`` is multiplicative covariance
    inflation (rho >= 1 combats sampling noise from finite M).
    """

    def __init__(self, ensemble, *, obs_field: str | None = None,
                 sigma: float = 0.05, inflation: float = 1.0):
        self.ens = ensemble
        names = ensemble._field_names
        self._obs_idx = (0 if obs_field is None
                         else names.index(obs_field))
        if sigma <= 0:
            raise ValueError("sigma must be > 0")
        if inflation < 1.0:
            raise ValueError("inflation must be >= 1 (multiplicative)")
        self.sigma = float(sigma)
        self.inflation = float(inflation)
        grid = ensemble.grid
        d = grid.decomp
        dtype = np.dtype(grid.dtype)
        # observations are compared on wet internal points only.  The
        # geometric part comes from the host-side layout; the wet mask
        # is a DEVICE op on the model's (possibly sharded) mask — never
        # np.asarray a sharded array in library code (multi-controller
        # processes cannot materialise remote shards).
        wet = jax.device_put(jnp.asarray(
            np.asarray(layout.internal_mask(d), dtype=dtype)),
            grid.sharding)
        model = ensemble.model
        t_wet = getattr(model, "_t_upd", None)
        if t_wet is None:
            t_wet = getattr(model, "_t_wet", None)
        if t_wet is not None:
            wet = wet * t_wet.astype(wet.dtype)
        self._wet = wet
        self._prog = None

    # ------------------------------------------------------------------
    def _program(self):
        """One jitted shard_map program: moments -> weights -> update."""
        if self._prog is not None:
            return self._prog
        ens = self.ens
        m = ens.n_members
        n_state = len(ens.states)
        oi = self._obs_idx
        mesh = ens.grid.mesh

        def body(obs, obs_w, wet, sig_inv2, rho, *state):
            # local obs weight: observed wet internal points, 1/sigma^2
            w = obs_w * wet * sig_inv2
            eo = state[oi]
            em = jnp.mean(eo, axis=0)
            ep = eo - em[None]
            # obs-space moments: one psum of M^2 + M + 1 scalars total
            S = lax.psum(jnp.einsum("myx,nyx->mn", ep, ep * w[None]),
                         ("y", "x"))
            d = lax.psum(jnp.einsum("myx,yx->m", ep, (obs - em) * w),
                         ("y", "x"))
            wtot = _etkf_weights(S, d, m, rho)
            out = []
            for f in state:
                fm = jnp.mean(f, axis=0)
                fp = f - fm[None]
                # the MXU leg: member-space mix at every local point
                out.append(fm[None]
                           + jnp.einsum("mk,myx->kyx", wtot, fp))
            return tuple(out)

        blk = P(None, "y", "x")
        smapped = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("y", "x"),) * 3 + (P(),) * 2 + (blk,) * n_state,
            out_specs=(blk,) * n_state, check_vma=False)
        self._prog = jax.jit(smapped)
        return self._prog

    # ------------------------------------------------------------------
    def analysis(self, obs_global, obs_mask=None) -> dict:
        """Assimilate one batch of observations into the ensemble
        (in place).  Returns obs-space diagnostics: RMS innovation of
        the ensemble mean before and after, and the mean spread of the
        observed field before/after (on observed points)."""
        ens = self.ens
        grid = ens.grid
        d = grid.decomp
        dtype = np.dtype(grid.dtype)
        obs = jax.device_put(jnp.asarray(layout.stack_global(
            d, np.asarray(obs_global), mode="zeros", dtype=dtype)),
            grid.sharding)
        if obs_mask is None:
            ow = jnp.ones_like(obs)
        else:
            ow = jnp.asarray(layout.stack_global(
                d, (np.asarray(obs_mask) != 0).astype(dtype),
                mode="zeros", dtype=dtype))
        ow = jax.device_put(ow, grid.sharding)

        before = self._obs_diagnostics(obs, ow)
        sig_inv2 = jnp.asarray(1.0 / self.sigma ** 2, dtype)
        rho = jnp.asarray(self.inflation, dtype)
        ens.states = tuple(self._program()(
            obs, ow, self._wet, sig_inv2, rho, *ens.states))
        after = self._obs_diagnostics(obs, ow)
        return {"rms_innovation_before": before[0],
                "rms_innovation_after": after[0],
                "spread_before": before[1], "spread_after": after[1]}

    def _obs_diagnostics(self, obs, ow):
        """(RMS mean innovation, mean member spread) on observed wet
        internal points — device-resident reductions only."""
        w = ow * self._wet
        npts = jnp.maximum(jnp.sum(w), 1.0)
        eo = self.ens.states[self._obs_idx]
        em = jnp.mean(eo, axis=0)
        rms = jnp.sqrt(jnp.sum((em - obs) ** 2 * w) / npts)
        spread = jnp.sqrt(jnp.sum(jnp.var(eo, axis=0) * w) / npts)
        return float(rms), float(spread)
