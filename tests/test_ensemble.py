"""Ensemble execution: M replicas in one program == M sequential runs.

The leading-axis broadcast must not change per-member arithmetic, and
the coalesced halo exchange must deliver each member its own strips.
"""
import numpy as np
import pytest

from dl_esm_inf_tpu.models import gravity_wave as gw
from dl_esm_inf_tpu.models import shallow as sh
from dl_esm_inf_tpu.models import twolayer as tl
from dl_esm_inf_tpu.models.ensemble import Ensemble


def _etas(n, gnx, gny, seed=0):
    rng = np.random.default_rng(seed)
    base = gw.gaussian_eta(gnx, gny, amp=0.5)
    return np.stack([base * (1 + 0.2 * k)
                     + 0.01 * rng.standard_normal((gny, gnx))
                     for k in range(n)])


def test_gravity_wave_ensemble_matches_sequential():
    gnx = gny = 32
    M, nsteps = 3, 12
    etas = _etas(M, gnx, gny)

    ens = Ensemble(gw.build(gnx, gny, dt=0.05, depth=10.0), M)
    ens.set_member_states(0, etas)
    ens.run(nsteps)
    got = ens.gather_all()
    assert got["eta"].shape == (M, gny, gnx)

    for k in range(M):
        m = gw.build(gnx, gny, dt=0.05, depth=10.0)
        m.set_initial_eta(etas[k])
        m.run(nsteps)
        want = m.gather()
        for f in ("eta", "u", "v"):
            np.testing.assert_array_equal(
                got[f][k], want[f],
                err_msg=f"member {k} field {f} diverged from its "
                        f"sequential run")


def test_shallow_ensemble_periodic_no_masks():
    gn, M = 24, 2
    base = sh.build(gn, gn, dt=0.02)
    ens = Ensemble(base, M)
    etas = _etas(M, gn, gn, seed=1)
    ens.set_member_states(0, etas)
    ens.run(8)
    got = ens.gather_all()

    for k in range(M):
        m = sh.build(gn, gn, dt=0.02)
        m.set_initial_eta(etas[k])
        m.run(8)
        np.testing.assert_array_equal(got["eta"][k], m.gather()["eta"])


def test_twolayer_ensemble_six_field_state():
    gn, M = 24, 2
    ens = Ensemble(tl.build(gn, gn, dt=0.02), M)
    etas = _etas(M, gn, gn, seed=2)
    ens.set_member_states(0, etas)          # perturb eta1 only
    ens.run(6)
    got = ens.gather_all()
    assert set(got) == {"eta1", "eta2", "u1", "v1", "u2", "v2"}

    m = tl.build(gn, gn, dt=0.02)
    m.set_initial(etas[1], np.zeros((gn, gn)))
    m.run(6)
    # twolayer's layer-coupling expressions fuse differently (FMA
    # contraction) with broadcast operands: roundoff-level, not exact
    np.testing.assert_allclose(got["eta1"][1], m.gather()["eta1"],
                               rtol=0, atol=1e-14)


def test_nlayer_ensemble_multi_level_state():
    """Ensembles of MULTI-LEVEL fields: states are (M, L, ly, lx) —
    the exchange carries both leading axes and the level-axis cumsum
    is leading-dim agnostic.  Members == sequential runs."""
    from dl_esm_inf_tpu.models import nlayer as nlr
    gn, M, L, nsteps = 24, 3, 3, 10
    rng = np.random.default_rng(4)
    base = gw.gaussian_eta(gn, gn, amp=0.3)
    etas = np.stack([
        np.stack([base * (1 + 0.1 * k + 0.05 * lvl)
                  + 0.01 * rng.standard_normal((gn, gn))
                  for lvl in range(L)])
        for k in range(M)])

    ens = Ensemble(nlr.build(gn, gn, dt=0.02, layers=L), M)
    ens.set_member_states(0, etas)
    ens.run(nsteps)
    got = ens.gather_all()
    assert got["eta"].shape == (M, L, gn, gn)

    for k in range(M):
        m = nlr.build(gn, gn, dt=0.02, layers=L)
        m.set_initial(etas[k])
        m.run(nsteps)
        want = m.gather()
        for f in ("eta", "u", "v"):
            np.testing.assert_allclose(
                got[f][k], want[f], rtol=0, atol=1e-14,
                err_msg=f"member {k} field {f}")


def test_semi_implicit_ensemble_chebyshev():
    """An ensemble of IMPLICIT models: possible because the Chebyshev
    in-step solve is dot-free and member-independent; members match
    sequential runs.  CG is rejected (its psums would couple members)."""
    from dl_esm_inf_tpu.models import semi_implicit as si
    gn, M = 24, 2
    etas = _etas(M, gn, gn, seed=3)
    base = si.build(gn, gn, dt=1.0, depth=10.0, tol=1e-11,
                    solver="chebyshev")
    ens = Ensemble(base, M)
    ens.set_member_states(0, etas)
    ens.run(5)
    got = ens.gather_all()

    for k in range(M):
        m = si.build(gn, gn, dt=1.0, depth=10.0, tol=1e-11,
                     solver="chebyshev")
        m.set_initial_eta(etas[k])
        m.run(5)
        want = m.gather()
        for f in ("eta", "u", "v"):
            np.testing.assert_allclose(got[f][k], want[f], rtol=0,
                                       atol=1e-12)

    with pytest.raises(ValueError, match="chebyshev"):
        Ensemble(si.build(gn, gn, dt=1.0), 2)


def test_semi_implicit_open_boundary_ensemble():
    """Ensemble x implicit x open boundary: the time-dependent
    external elevation rides the threaded step index; members match
    sequential runs."""
    from dl_esm_inf_tpu.models import semi_implicit as si
    gn, M = 24, 2
    etas = _etas(M, gn, gn, seed=6) * 0.3

    def build():
        return si.build(gn, gn, dt=0.5, depth=10.0, tol=1e-11,
                        solver="chebyshev", open_north=True,
                        bc_amp=0.05, bc_omega=0.3)

    ens = Ensemble(build(), M)
    ens.set_member_states(0, etas)
    ens.run(3)
    ens.run(2)                    # istep continuation under forcing
    got = ens.gather_all()
    for k in range(M):
        m = build()
        m.set_initial_eta(etas[k])
        m.run(3)
        m.run(2)
        want = m.gather()
        for f in ("eta", "u", "v"):
            np.testing.assert_allclose(got[f][k], want[f], rtol=0,
                                       atol=1e-11)


@pytest.mark.parametrize("halo_width", [1, 2])
def test_flagship_ensemble_matches_sequential(halo_width):
    """NEMOLite2D ensembles: the time-dependent tidal forcing rides
    the threaded global step index, so members at any run() split
    match a sequential flagship run.  halo_width=2 exercises the
    deep-halo communication-free chain, which needs the ensemble's
    exchange at depth 2 (regression: it was hard-coded depth 1)."""
    from dl_esm_inf_tpu.models import nemolite2d as nl
    gn, M = 32, 2
    etas = _etas(M, gn, gn, seed=4) * 0.2
    base = nl.build(gn, gn, open_north=True, halo_width=halo_width)
    ens = Ensemble(base, M)
    # per-member initial ssh: the flagship derives sshn_u/v from ssh,
    # but the step carries only (ssh, u, v) so setting member ssh is
    # enough at t=0 with zero velocities
    ens.set_member_states(0, etas)
    ens.run(4)
    ens.run(3)                    # second segment: istep0 must advance
    got = ens.gather_all()

    for k in range(M):
        m = nl.build(gn, gn, open_north=True, halo_width=halo_width)
        m.set_initial_ssh(etas[k])
        m.run(4)
        m.run(3)
        want = m.gather()
        np.testing.assert_allclose(got["ssh"][k], want["sshn"],
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(got["u"][k], want["un"],
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(got["v"][k], want["vn"],
                                   rtol=0, atol=1e-12)


def test_flagship_ensemble_continues_base_clock():
    """An ensemble built from a mid-run model inherits its step index:
    member 0 (unperturbed) continues exactly like the base run
    (regression: _istep0 restarted at 0, rewinding the tide)."""
    from dl_esm_inf_tpu.models import nemolite2d as nl
    gn = 32
    eta0 = _etas(1, gn, gn, seed=5)[0] * 0.2
    base = nl.build(gn, gn, open_north=True)
    base.set_initial_ssh(eta0)
    base.run(5)
    ens = Ensemble(base, 2)       # members start from the step-5 state
    ens.run(3)

    seq = nl.build(gn, gn, open_north=True)
    seq.set_initial_ssh(eta0)
    seq.run(5)
    seq.run(3)
    np.testing.assert_allclose(ens.gather_all()["ssh"][0],
                               seq.gather()["sshn"], rtol=0,
                               atol=1e-12)


def test_ensemble_save_load_restart():
    """Cycling DA needs restarts: save -> load into a FRESH ensemble ->
    continue == uninterrupted run, bitwise, including the flagship's
    time-dependent forcing clock."""
    import os
    import tempfile
    from dl_esm_inf_tpu.models import nemolite2d as nl
    gn, M = 32, 3
    etas = _etas(M, gn, gn, seed=5)

    def fresh():
        e = Ensemble(nl.build(gn, gn, open_north=True), M)
        return e

    a = fresh()
    a.set_member_states(0, etas * 0.3)
    a.run(4)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ens.npz")
        a.save(path)
        a.run(3)

        b = fresh()
        b.load(path)
        assert b._istep0 == 4
        b.run(3)
    ga, gb = a.gather_all(), b.gather_all()
    for k in ga:
        np.testing.assert_array_equal(gb[k], ga[k])


def test_ensemble_statistics_and_guards():
    gn = 16
    base = gw.build(gn, gn, dt=0.05)
    base.set_initial_eta(gw.gaussian_eta(gn, gn, amp=0.3))
    ens = Ensemble(base, 3)                  # identical members
    ens.run(4)
    mean, spread = ens.mean_and_spread()
    assert mean["eta"].shape == (gn, gn)
    # identical members: spread is pure mean-subtraction roundoff
    assert float(np.abs(spread["eta"]).max()) < 1e-15

    with pytest.raises(ValueError, match="leading dim"):
        ens.set_member_states(0, np.zeros((2, gn, gn)))
    with pytest.raises(ValueError, match="n_members"):
        Ensemble(base, 0)
    with pytest.raises(TypeError, match="adapter"):
        Ensemble(object(), 2)
