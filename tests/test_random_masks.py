"""Property-style stress: random wet/dry/outside masks and random
decompositions must preserve decomposition invariance and stability —
the mask/seam machinery must hold for arbitrary coastlines, not just
the canonical basin."""
import numpy as np
import pytest

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.models import nemolite2d as nl
from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta


def random_tmask(gnx, gny, seed, p_dry=0.2, p_out=0.05):
    rng = np.random.default_rng(seed)
    t = np.ones((gny, gnx), dtype=np.int32)
    r = rng.random((gny, gnx))
    t[r < p_dry] = 0
    t[r > 1.0 - p_out] = -1
    # keep the domain edge closed like the reference's external BC
    t[0, :] = t[-1, :] = 0
    t[:, 0] = t[:, -1] = 0
    return t


def build(tmask, ndom, halo_width=1):
    gny, gnx = tmask.shape
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomains=ndom, halo_width=halo_width)
    dl.grid_init(grid, 1000.0, 1000.0, tmask)
    m = nl.NemoLite2D(grid, nl.Params(), 100.0)
    m.set_initial_ssh(gaussian_eta(gnx, gny, amp=0.3))
    return m


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("ndom", [4, 6])
def test_random_coastline_invariance(seed, ndom):
    t = random_tmask(40, 36, seed)
    m1 = build(t, 1)
    mn = build(t, ndom)
    m1.run(25)
    mn.run(25)
    g1, gn = m1.gather(), mn.gather()
    for k in ("sshn", "un", "vn"):
        assert np.all(np.isfinite(g1[k])), k
        np.testing.assert_allclose(gn[k], g1[k], rtol=1e-12, atol=1e-13,
                                   err_msg=f"seed={seed} {k}")


@pytest.mark.parametrize("seed,scheme", [(0, "vanleer"), (1, "upwind"),
                                         (2, "vanleer")])
def test_random_coastline_tracer(seed, scheme):
    """Tracer transport under arbitrary coastlines: exact conservation,
    golden equality and 1-vs-6-shard invariance for random masks and
    random divergence-free flows (the limiter's dry-neighbour
    degradation must hold at every ragged edge)."""
    from dl_esm_inf_tpu.models import tracer as tr
    gnx, gny = 40, 36
    t = random_tmask(gnx, gny, seed)
    t[t == -1] = 0      # tracer build treats the mask as wet/dry
    rng = np.random.default_rng(100 + seed)
    u, v = tr.streamfunction_velocities(
        0.3 * rng.standard_normal((gny, gnx)))
    c0 = np.abs(gaussian_eta(gnx, gny, amp=1.0)) + 0.01
    want = tr.golden_reference(c0[:gny, :gnx], t, u, v, dt=0.4,
                               nsteps=25, kappa=0.03, scheme=scheme)
    wet = t == 1
    got = {}
    for ndom in (1, 6):
        m = tr.build(gnx, gny, ndomains=ndom, dt=0.4, u=u, v=v,
                     kappa=0.03, scheme=scheme, tmask=t)
        m.set_initial_tracer(c0[:gny, :gnx])
        m0 = m.mass()
        m.run(25)
        assert abs(m.mass() - m0) <= 1e-12 * abs(m0), f"seed={seed}"
        got[ndom] = m.gather()["c"]
        np.testing.assert_allclose(got[ndom][wet], want[wet], rtol=0,
                                   atol=1e-12, err_msg=f"seed={seed}")
    np.testing.assert_allclose(got[6], got[1], rtol=0, atol=1e-12)


def test_random_coastline_dry_cells_inert():
    t = random_tmask(32, 28, seed=7)
    m = build(t, 4)
    ssh0 = m.gather()["sshn"].copy()
    m.run(40)
    g = m.gather()
    dry = t == 0
    # dry T cells never change; dry-adjacent faces carry no flow
    np.testing.assert_array_equal(g["sshn"][dry], ssh0[dry])
    u_dry = (t == 0) | (np.roll(t, -1, axis=1) == 0)
    v_dry = (t == 0) | (np.roll(t, -1, axis=0) == 0)
    # interior only (the rolled masks wrap at the global edge)
    np.testing.assert_array_equal(g["un"][1:-1, 1:-1][u_dry[1:-1, 1:-1]],
                                  0.0)
    np.testing.assert_array_equal(g["vn"][1:-1, 1:-1][v_dry[1:-1, 1:-1]],
                                  0.0)
