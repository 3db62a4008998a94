"""End-to-end slice: gravity-wave SW vs independent NumPy golden, fp64,
serial and multi-shard (SURVEY §7 M2 + BASELINE config #2 scaled down)."""
import numpy as np
import pytest

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.models.gravity_wave import (
    GravityWaveModel, default_tmask, gaussian_eta, golden_reference)


def build(gnx, gny, ndom, dt=0.05):
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomains=ndom)
    tmask = default_tmask(gnx, gny)
    dl.grid_init(grid, 1.0, 1.0, tmask)
    model = GravityWaveModel(grid, dt=dt, depth=10.0)
    eta0 = gaussian_eta(gnx, gny)
    model.set_initial_eta(eta0)
    return model, eta0, tmask


@pytest.mark.parametrize("ndom", [1, 4, 6])
def test_allclose_vs_golden(ndom):
    gnx, gny, nsteps = 48, 40, 100
    model, eta0, tmask = build(gnx, gny, ndom)
    model.run(nsteps)
    got = model.gather()
    want = golden_reference(eta0, tmask, 1.0, 1.0, model.dt, nsteps,
                            depth=10.0)
    for k in ("eta", "u", "v"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-12, atol=1e-12,
                                   err_msg=k)


def test_long_run_1024_steps_allclose_vs_golden():
    """BASELINE north star: fp64 allclose vs the independent golden
    after 1024 steps (domain scaled down from 512^2 for CI; the
    per-step numerics are size-independent)."""
    gnx, gny, nsteps = 128, 96, 1024
    model, eta0, tmask = build(gnx, gny, 4)
    model.run(nsteps)
    got = model.gather()
    want = golden_reference(eta0, tmask, 1.0, 1.0, model.dt, nsteps,
                            depth=10.0)
    for k in ("eta", "u", "v"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-11, atol=1e-11,
                                   err_msg=k)


def test_serial_equals_distributed():
    """Decomposition must not change the answer (same global stencil)."""
    m1, eta0, _ = build(32, 32, 1)
    m6, _, _ = build(32, 32, 6)
    m1.run(50)
    m6.run(50)
    np.testing.assert_allclose(m1.gather()["eta"], m6.gather()["eta"],
                               rtol=1e-12, atol=1e-13)


def test_chunked_run_matches_single_run():
    """10 runs of 10 steps == 1 run of 100 steps (state round-trips
    through Fields and halo exchange correctly)."""
    ma, eta0, tmask = build(32, 24, 4)
    mb, _, _ = build(32, 24, 4)
    ma.run(100)
    for _ in range(10):
        mb.run(10)
    np.testing.assert_allclose(ma.gather()["eta"], mb.gather()["eta"],
                               rtol=1e-12, atol=1e-13)


def test_wave_moves_and_walls_hold():
    model, eta0, tmask = build(48, 48, 4)
    model.run(200)
    g = model.gather()
    # the bump must have evolved
    assert not np.allclose(g["eta"], eta0, atol=1e-6)
    # land ring: eta untouched, u/v zero at/inside walls
    np.testing.assert_array_equal(g["eta"][0, :], eta0[0, :])
    np.testing.assert_array_equal(g["u"][:, -2:], 0.0)
    np.testing.assert_array_equal(g["v"][-2:, :], 0.0)
    # mass conservation over wet cells (fp64): sum eta constant
    wet = tmask == 1
    assert abs(g["eta"][wet].sum() - eta0[wet].sum()) < 1e-9
