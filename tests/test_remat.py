"""Checkpointed adjoints (ops/adjoint.py): gradients are unchanged and
the per-iteration residual stacks of the backward pass shrink.

The reference has no adjoint at all; this pins the framework's
production-length 4D-Var story — ``remat_chunk`` trades one extra
forward evaluation for O(n/c + c) instead of O(n) stored state.
"""
import numpy as np
import pytest

import jax

from dl_esm_inf_tpu.models import gravity_wave as gw
from dl_esm_inf_tpu.models import nemolite2d as nl
from dl_esm_inf_tpu.models import semi_implicit as si
from dl_esm_inf_tpu.models.assimilation import make_cost_fn


def _stacked_scan_bytes(jaxpr):
    """Total bytes of stacked per-iteration scan outputs (the adjoint's
    residual stacks have leading dim == the loop length), recursing
    through pjit/shard_map/scan sub-jaxprs."""
    total = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "scan":
            n = eqn.params["length"]
            for v in eqn.outvars:
                shp = getattr(v.aval, "shape", ())
                if shp and shp[0] == n:
                    total += v.aval.size * v.aval.dtype.itemsize
        for p in eqn.params.values():
            if hasattr(p, "jaxpr"):
                total += _stacked_scan_bytes(p.jaxpr)
            elif hasattr(p, "eqns"):
                total += _stacked_scan_bytes(p)
            elif isinstance(p, (list, tuple)):
                for q in p:
                    if hasattr(q, "jaxpr"):
                        total += _stacked_scan_bytes(q.jaxpr)
                    elif hasattr(q, "eqns"):
                        total += _stacked_scan_bytes(q)
    return total


def _flagship_obs(N, steps):
    truth = nl.build(N, N, open_north=True)
    truth.set_initial_ssh(gw.gaussian_eta(N, N, amp=0.2))
    obs, done = {}, 0
    for t in sorted(steps):
        truth.run(t - done)
        done = t
        obs[t] = truth.gather()["sshn"]
    return obs


def test_flagship_remat_gradients_match():
    """Per-step (chunk=1) and two-level (chunk=4, with a remainder:
    14 = 3*4 + 2) checkpointing reproduce the plain adjoint of the
    NONLINEAR flagship bitwise — remat changes what is stored, never
    what is computed."""
    N = 32
    obs = _flagship_obs(N, [14])
    m = nl.build(N, N, open_north=True)
    cost, pack, _ = make_cost_fn(m, obs)
    x0 = pack(gw.gaussian_eta(N, N, amp=0.05))
    c_plain = float(cost(x0))
    g_plain = np.asarray(jax.jit(jax.grad(cost))(x0))
    for ck in (1, 4):
        mr = nl.build(N, N, open_north=True)
        cost_r, pack_r, _ = make_cost_fn(mr, obs, remat_chunk=ck)
        xr = pack_r(gw.gaussian_eta(N, N, amp=0.05))
        assert float(cost_r(xr)) == c_plain
        g_r = np.asarray(jax.jit(jax.grad(cost_r))(xr))
        np.testing.assert_array_equal(g_r, g_plain)


def test_flagship_remat_reduces_residual_stacks():
    """The structural measurement: stacked per-iteration scan outputs
    (the residuals the backward pass keeps) shrink by >=4x with
    per-step checkpointing and further with the two-level scheme."""
    N = 32
    obs = _flagship_obs(N, [16])
    sizes = {}
    for ck in (None, 1, 4):
        m = nl.build(N, N, open_north=True)
        cost, pack, _ = make_cost_fn(m, obs, remat_chunk=ck)
        jx = jax.make_jaxpr(jax.grad(cost))(pack(np.zeros((N, N))))
        sizes[ck] = _stacked_scan_bytes(jx.jaxpr)
    assert sizes[1] * 4 <= sizes[None]
    assert sizes[4] < sizes[1]


def test_gravity_wave_remat_matches():
    """The linear model's adjoint stores no per-step primal residuals
    to begin with (linear VJPs need only the constant masks), but the
    checkpointed loop must still be exact, remainder path included
    (10 = 2*4 + 2)."""
    N = 24
    truth = gw.build(N, N, dt=0.05, depth=10.0)
    truth.set_initial_eta(gw.gaussian_eta(N, N, amp=0.5))
    truth.run(10)
    obs = {10: truth.gather()["eta"]}
    m = gw.build(N, N, dt=0.05, depth=10.0)
    cost, pack, _ = make_cost_fn(m, obs)
    x0 = pack(gw.gaussian_eta(N, N, amp=0.1))
    g_plain = np.asarray(jax.jit(jax.grad(cost))(x0))
    for ck in (1, 4):
        mr = gw.build(N, N, dt=0.05, depth=10.0)
        cost_r, pack_r, _ = make_cost_fn(mr, obs, remat_chunk=ck)
        g_r = np.asarray(jax.jit(jax.grad(cost_r))(
            pack_r(gw.gaussian_eta(N, N, amp=0.1))))
        np.testing.assert_array_equal(g_r, g_plain)


def test_implicit_remat_gradient_matches():
    """Checkpointing composes with implicit differentiation: the
    backward sweep re-runs the forward SOLVE of the chunk being
    differentiated, then custom_linear_solve's adjoint solve runs as
    usual.  Gradient equals the plain adjoint."""
    N = 20
    truth = si.build(N, N, dt=1.0, depth=10.0, tol=1e-12,
                     differentiable=True)
    truth.set_initial_eta(gw.gaussian_eta(N, N, amp=0.5))
    truth.run(5)
    obs = {5: truth.gather()["eta"]}

    m = si.build(N, N, dt=1.0, depth=10.0, tol=1e-12,
                 differentiable=True)
    cost, pack, _ = make_cost_fn(m, obs)
    x0 = pack(np.zeros((N, N)))
    g_plain = np.asarray(jax.jit(jax.grad(cost))(x0))

    mr = si.build(N, N, dt=1.0, depth=10.0, tol=1e-12,
                  differentiable=True)
    cost_r, pack_r, _ = make_cost_fn(mr, obs, remat_chunk=2)
    g_r = np.asarray(jax.jit(jax.grad(cost_r))(pack_r(np.zeros((N, N)))))
    np.testing.assert_allclose(g_r, g_plain, rtol=0, atol=1e-13)


def test_remat_forward_run_unchanged():
    """step_program(remat_chunk=...) is forward-bitwise the plain
    program (checkpointing is an AD-only annotation)."""
    N = 24
    m = nl.build(N, N, open_north=True)
    m.set_initial_ssh(gw.gaussian_eta(N, N, amp=0.2))
    state = (m.sshn_t.data, m.un.data, m.vn.data)
    import jax.numpy as jnp
    plain = m.step_program(7)(jnp.int32(0), state, m._mask_codes)
    ck = m.step_program(7, remat_chunk=3)(jnp.int32(0), state,
                                          m._mask_codes)
    for a, b in zip(plain, ck):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_guards():
    """remat needs the differentiable jnp path."""
    m = gw.build(16, 16, dt=0.05, halo_width=2)
    m.set_steps_per_exchange(2)
    with pytest.raises(ValueError, match="remat"):
        m.step_program(4, remat_chunk=1)
    mn = nl.build(32, 32, halo_width=4)
    mn.set_steps_per_exchange(2)
    with pytest.raises(ValueError, match="remat"):
        mn.step_program(4, remat_chunk=2)
