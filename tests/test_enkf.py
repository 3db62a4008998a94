"""ETKF on the ensemble runner (models/enkf.py): twin-experiment skill,
mean/spread algebra, decomposition invariance (the analysis needs no
halo exchange because every device applies the same member-space
weights), multivariate updates, inflation."""
import numpy as np
import pytest

from dl_esm_inf_tpu.models import gravity_wave as gw
from dl_esm_inf_tpu.models import nemolite2d as nl
from dl_esm_inf_tpu.models.enkf import ETKF
from dl_esm_inf_tpu.models.ensemble import Ensemble


def _smooth_noise(rng, N, ncut=3):
    """Unit-amplitude random field with only low-wavenumber content
    (an M-member ensemble can only correct errors correlated with its
    spread; smooth perturbations make the twin experiment statistically
    consistent instead of asking rank M-1 to fit white noise)."""
    z = np.fft.rfft2(rng.standard_normal((N, N)))
    ky = np.abs(np.fft.fftfreq(N) * N)[:, None]
    kx = (np.fft.rfftfreq(N) * N)[None, :]
    f = np.fft.irfft2(np.where((ky <= ncut) & (kx <= ncut), z, 0),
                      s=(N, N))
    return f / np.abs(f).max()


def _member_perturbations(N, m, amp, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([amp * _smooth_noise(rng, N) for _ in range(m)])


def _perturbed_ensemble(model, m, amp, seed=0):
    """Ensemble whose members start from per-member smooth-perturbed
    bumps; returns (ensemble, perturbations)."""
    N = model.grid.decomp.global_nx
    base = gw.gaussian_eta(N, N, amp=0.3)
    perts = _member_perturbations(N, m, amp, seed)
    ens = Ensemble(model, m)
    ens.set_member_states(0, base + perts)
    return ens


def _truth_and_obs(N, cycles, fsteps, dt=0.05):
    truth = gw.build(N, N, dt=dt, depth=10.0)
    truth.set_initial_eta(gw.gaussian_eta(N, N, amp=0.5))
    obs = []
    for _ in range(cycles):
        truth.run(fsteps)
        obs.append(truth.gather()["eta"])
    return truth, obs


def test_twin_experiment_reduces_error_and_spread():
    """Cycled forecast/analysis against a truth whose initial error
    lies in the ensemble perturbation subspace (preserved exactly by
    the linear dynamics): the filter's optimality property — each
    analysis reduces innovation and spread, and the subspace error is
    corrected nearly completely (limited only by the (M-1)I
    regularisation and observation noise)."""
    N, M = 24, 8
    perts = _member_perturbations(N, M, amp=0.2, seed=0)
    base = gw.gaussian_eta(N, N, amp=0.3)
    truth = gw.build(N, N, dt=0.05, depth=10.0)
    # the error (truth minus ENSEMBLE MEAN, i.e. minus base + p̄) must
    # have zero coefficient sum: the ensemble spans only the CENTERED
    # subspace {sum a_i p_i : sum a_i = 0}
    truth.set_initial_eta(base + perts.mean(axis=0)
                          + 0.5 * (perts[1] - perts[3])
                          + 0.3 * (perts[5] - perts[2]))
    obs = []
    for _ in range(3):
        truth.run(5)
        obs.append(truth.gather()["eta"])

    m = gw.build(N, N, dt=0.05, depth=10.0)
    ens = _perturbed_ensemble(m, M, amp=0.2, seed=0)
    filt = ETKF(ens, sigma=1e-3)
    first = None
    for y in obs:
        ens.run(5)
        diag = filt.analysis(y)
        if first is None:
            first = diag["rms_innovation_before"]
        assert diag["rms_innovation_after"] < diag["rms_innovation_before"]
        assert diag["spread_after"] < diag["spread_before"]
    assert diag["rms_innovation_after"] < 0.05 * first


def test_analysis_preserves_mean_on_zero_innovation():
    """Observing exactly the forecast mean leaves the mean unchanged
    (w̄ = 0) while still contracting the perturbations."""
    N, M = 24, 6
    m = gw.build(N, N, dt=0.05, depth=10.0)
    ens = _perturbed_ensemble(m, M, amp=0.1)
    ens.run(4)
    mean, _ = ens.mean_and_spread()
    filt = ETKF(ens, sigma=0.05)
    diag = filt.analysis(mean["eta"])
    mean_a, _ = ens.mean_and_spread()
    np.testing.assert_allclose(mean_a["eta"], mean["eta"],
                               rtol=0, atol=1e-11)
    assert diag["spread_after"] < diag["spread_before"]


def test_decomposition_invariant_analysis():
    """1-domain and 8-domain cycled ETKF produce the same ensemble —
    including a post-analysis forecast, which would diverge if the
    analysis left shard halos inconsistent."""
    N, M = 16, 5
    truth, obs = _truth_and_obs(N, cycles=2, fsteps=4)
    got = {}
    for ndom in (1, 8):
        m = gw.build(N, N, ndomains=ndom, dt=0.05, depth=10.0)
        ens = _perturbed_ensemble(m, M, amp=0.15, seed=3)
        filt = ETKF(ens, sigma=0.03)
        for y in obs:
            ens.run(4)
            filt.analysis(y)
        ens.run(3)     # halo-consistency leg
        got[ndom] = ens.gather_all()
    for k in got[1]:
        np.testing.assert_allclose(got[8][k], got[1][k],
                                   rtol=0, atol=1e-9)


def test_observing_eta_updates_velocities():
    """The multivariate update: cross-covariances in the ensemble
    carry the eta innovation into u and v."""
    N, M = 24, 6
    truth, obs = _truth_and_obs(N, cycles=1, fsteps=6)
    m = gw.build(N, N, dt=0.05, depth=10.0)
    ens = _perturbed_ensemble(m, M, amp=0.15)
    ens.run(6)
    before = ens.gather_all()
    ETKF(ens, sigma=0.02).analysis(obs[0])
    after = ens.gather_all()
    assert np.abs(after["u"] - before["u"]).max() > 1e-8
    assert np.abs(after["v"] - before["v"]).max() > 1e-8


def test_partial_observations_and_inflation():
    """A mask restricts the update to observed points' information;
    inflation rho > 1 keeps more spread than rho = 1."""
    N, M = 24, 6
    truth, obs = _truth_and_obs(N, cycles=1, fsteps=5)
    mask = np.zeros((N, N))
    mask[:, : N // 2] = 1.0
    spreads = {}
    for rho in (1.0, 1.5):
        m = gw.build(N, N, dt=0.05, depth=10.0)
        ens = _perturbed_ensemble(m, M, amp=0.15, seed=7)
        ens.run(5)
        filt = ETKF(ens, sigma=0.02, inflation=rho)
        diag = filt.analysis(obs[0], obs_mask=mask)
        assert diag["rms_innovation_after"] < diag["rms_innovation_before"]
        spreads[rho] = diag["spread_after"]
    assert spreads[1.5] > spreads[1.0]


def test_flagship_ensemble_etkf():
    """ETKF composes with the NONLINEAR flagship ensemble adapter
    (obs field is the sea-surface height, masks are packed codes)."""
    N, M = 32, 5
    truth = nl.build(N, N, open_north=True)
    truth.set_initial_ssh(gw.gaussian_eta(N, N, amp=0.2))
    truth.run(6)
    y = truth.gather()["sshn"]

    m = nl.build(N, N, open_north=True)
    rng = np.random.default_rng(1)
    base = gw.gaussian_eta(N, N, amp=0.2)
    ens = Ensemble(m, M)
    ens.set_member_states(0, np.stack(
        [base + 0.05 * rng.standard_normal((N, N)) for _ in range(M)]))
    ens.run(6)
    diag = ETKF(ens, sigma=0.01).analysis(y)
    assert diag["rms_innovation_after"] < diag["rms_innovation_before"]


def test_letkf_huge_radius_matches_global():
    """With a localization radius far beyond the domain, the
    Gaspari-Cohn taper is ~1 at every (point, obs) pair and the LETKF
    reduces to the global ETKF."""
    N, M = 16, 5
    truth, obs = _truth_and_obs(N, cycles=1, fsteps=4)
    got = {}
    for rad in (None, 1e6):
        m = gw.build(N, N, dt=0.05, depth=10.0)
        ens = _perturbed_ensemble(m, M, amp=0.15, seed=2)
        ens.run(4)
        ETKF(ens, sigma=0.02, localization_radius=rad).analysis(obs[0])
        got[rad] = ens.gather_all()
    for k in got[None]:
        np.testing.assert_allclose(got[1e6][k], got[None][k],
                                   rtol=0, atol=1e-7)


def test_letkf_decomposition_invariant():
    """Cycled LETKF + post-analysis forecast: 1 domain == 8 domains
    (per-point weights depend only on global coordinates and the
    global obs set, so shard halos stay consistent with no
    exchange)."""
    N, M = 16, 4
    truth, obs = _truth_and_obs(N, cycles=2, fsteps=4)
    got = {}
    for ndom in (1, 8):
        m = gw.build(N, N, ndomains=ndom, dt=0.05, depth=10.0)
        ens = _perturbed_ensemble(m, M, amp=0.15, seed=4)
        filt = ETKF(ens, sigma=0.03, localization_radius=4.0)
        for y in obs:
            ens.run(4)
            filt.analysis(y)
        ens.run(3)
        got[ndom] = ens.gather_all()
    for k in got[1]:
        np.testing.assert_allclose(got[8][k], got[1][k],
                                   rtol=0, atol=1e-9)


def test_letkf_locality():
    """Points beyond 2L of every observation are left exactly
    unchanged (their transform is the identity), while observed-side
    points move: the covariance-localisation contract that the global
    ETKF cannot honour."""
    N, M = 24, 5
    truth, obs = _truth_and_obs(N, cycles=1, fsteps=4)
    m = gw.build(N, N, dt=0.05, depth=10.0)
    ens = _perturbed_ensemble(m, M, amp=0.15, seed=6)
    ens.run(4)
    before = ens.gather_all()
    # observe only the left columns [1, 4); dx = 1 -> support < x=10
    mask = np.zeros((N, N))
    mask[:, 1:4] = 1.0
    filt = ETKF(ens, sigma=0.02, localization_radius=3.0)
    diag = filt.analysis(obs[0], obs_mask=mask)
    after = ens.gather_all()
    assert diag["rms_innovation_after"] <= diag["rms_innovation_before"]
    for k in before:
        far = np.abs(after[k][:, :, 12:] - before[k][:, :, 12:]).max()
        near = np.abs(after[k][:, :, :8] - before[k][:, :, :8]).max()
        assert far < 1e-12, k
        assert near > 1e-6, k


def test_letkf_implicit_chebyshev_ensemble():
    """The capability composition: LETKF over an ensemble of
    SEMI-IMPLICIT models (dot-free Chebyshev solve broadcasting over
    members) — localized analysis between implicit forecast cycles
    reduces the innovation and the cycle stays finite/stable at a dt
    beyond the explicit CFL limit."""
    from dl_esm_inf_tpu.models import semi_implicit as si
    from dl_esm_inf_tpu.models.ensemble import Ensemble
    N, M = 20, 4
    truth = si.build(N, N, dt=1.0, depth=10.0, solver="chebyshev")
    truth.set_initial_eta(gw.gaussian_eta(N, N, amp=0.5))
    obs = []
    for _ in range(2):
        truth.run(3)
        obs.append(truth.gather()["eta"])

    m = si.build(N, N, dt=1.0, depth=10.0, solver="chebyshev")
    rng = np.random.default_rng(9)
    base = gw.gaussian_eta(N, N, amp=0.3)
    ens = Ensemble(m, M)
    ens.set_member_states(0, np.stack(
        [base + 0.15 * _smooth_noise(rng, N) for _ in range(M)]))
    filt = ETKF(ens, sigma=0.02, localization_radius=5.0,
                inflation=1.05)
    for y in obs:
        ens.run(3)
        diag = filt.analysis(y)
        assert diag["rms_innovation_after"] < diag[
            "rms_innovation_before"]
    assert all(np.isfinite(v).all() for v in ens.gather_all().values())


def test_adaptive_inflation_under_model_error():
    """The textbook adaptive-inflation case: the assimilating model is
    WRONG (depth 12 vs truth 10, ~10% wave-speed error), so every
    forecast re-injects error while a fixed rho = 1 ensemble collapses
    toward false certainty and stops correcting.  Wang-Bishop adaptive
    inflation reads the variance deficit off the innovation statistics
    each cycle and keeps the filter responsive."""
    N, M = 24, 6
    truth, obs = _truth_and_obs(N, cycles=6, fsteps=5)
    spread, gain = {}, {}
    for adaptive in (False, True):
        m = gw.build(N, N, dt=0.05, depth=12.0)     # imperfect model
        ens = _perturbed_ensemble(m, M, amp=0.15, seed=8)
        filt = ETKF(ens, sigma=0.005, adaptive_inflation=adaptive,
                    inflation_max=50.0)
        reductions = []
        for i, y in enumerate(obs):
            ens.run(5)
            diag = filt.analysis(y)
            if i == 1 and adaptive:
                # the estimator itself: clip((rms^2-sigma^2)/spread^2)
                want = min(50.0, max(1.0, (
                    diag["rms_innovation_before"] ** 2 - 0.005 ** 2)
                    / diag["spread_before"] ** 2))
                assert abs(diag["inflation"] - want) < 1e-9 * want
            if i > 0:
                reductions.append(diag["rms_innovation_before"]
                                  - diag["rms_innovation_after"])
        spread[adaptive] = diag["spread_after"]
        gain[adaptive] = sum(reductions)
    # fixed rho collapses toward false certainty; adaptive sustains
    # spread and keeps correcting (3x the cycled innovation reduction)
    assert spread[True] > 2.0 * spread[False], spread
    assert gain[True] > 2.0 * gain[False], gain


def test_multi_level_ensemble_etkf():
    """ETKF over an NLayerModel ensemble: observe the TOP interface of
    the (M, L, ly, lx) state; the update corrects every level of every
    field through the ensemble cross-covariances (ellipsis einsums).
    Both global and localized forms run; innovation drops."""
    from dl_esm_inf_tpu.models import nlayer as nlr
    from dl_esm_inf_tpu.models.ensemble import Ensemble
    N, M, L = 24, 5, 3
    rng = np.random.default_rng(11)
    base = gw.gaussian_eta(N, N, amp=0.3)
    perts = np.stack([0.1 * _smooth_noise(rng, N) for _ in range(M)])

    truth = nlr.build(N, N, dt=0.02, layers=L)
    truth.set_initial(np.stack(
        [base + perts.mean(0) + 0.4 * (perts[1] - perts[3])] * L))
    truth.run(5)
    y = truth.gather()["eta"][0]        # top interface only

    m = nlr.build(N, N, dt=0.02, layers=L)
    ens = Ensemble(m, M)
    ens.set_member_states(0, np.stack(
        [np.stack([base + p] * L) for p in perts]))
    ens.run(5)
    before = ens.gather_all()
    for rad in (None, 6.0):
        filt = ETKF(ens, sigma=1e-3, localization_radius=rad,
                    obs_level=0)
        diag = filt.analysis(y)
        assert diag["rms_innovation_after"] < diag[
            "rms_innovation_before"], rad
    after = ens.gather_all()
    # deeper levels moved too (cross-covariances carry the update down)
    assert np.abs(after["eta"][:, 1:] - before["eta"][:, 1:]).max() > 1e-6


def test_guards():
    m = gw.build(16, 16, dt=0.05, depth=10.0)
    ens = Ensemble(m, 4)
    with pytest.raises(ValueError, match="sigma"):
        ETKF(ens, sigma=0.0)
    with pytest.raises(ValueError, match="inflation"):
        ETKF(ens, sigma=0.1, inflation=0.5)
    with pytest.raises(ValueError, match="not in"):
        ETKF(ens, obs_field="nope")
    with pytest.raises(ValueError, match="localization"):
        ETKF(ens, sigma=0.1, localization_radius=0.0)
    with pytest.raises(ValueError, match="obs_level"):
        ETKF(ens, sigma=0.1, obs_level=1)      # 2D observed field
