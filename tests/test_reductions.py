"""Global checksum + scatter/gather round-trip.

Ports of tests/dist_mem/test_gsum.f90 (internal=1, external=-100 =>
checksum == jpiglo*jpjglo exactly, all four point types) and
tests/dist_mem/test_reduction.f90 (unique-value scatter -> local check ->
update -> gather -> global check).
"""
import numpy as np
import pytest

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.testing import unique_global_values


def make_grid(gnx, gny, ndom, offset=dl.OFFSET_NE):
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE), offset)
    grid.decompose(gnx, gny, ndomains=ndom)
    dl.grid_init(grid, 1.0, 1.0)
    return grid


@pytest.mark.parametrize("ndom", [1, 4, 6])
@pytest.mark.parametrize("points", [dl.T_POINTS, dl.U_POINTS, dl.V_POINTS,
                                    dl.F_POINTS])
def test_gsum(ndom, points):
    gnx, gny = 4, 10
    grid = make_grid(gnx, gny, ndom)
    fld = dl.Field(grid, points)
    m = fld.internal_mask_np()
    fld.set_data(np.where(m, 1.0, -100.0))
    assert dl.field_checksum(fld) == float(gnx * gny)


@pytest.mark.parametrize("ndom", [1, 4, 6])
def test_scatter_update_gather(ndom):
    gnx = gny = 10
    grid = make_grid(gnx, gny, ndom)
    g = unique_global_values(gnx, gny)
    fld = dl.Field(grid, dl.T_POINTS, init_global_data=g)

    # check_field_distribution (test_reduction.f90:128-153): every rank's
    # internal points hold the right global value; halos are stale (0).
    d = grid.decomp
    data = fld.get_data()
    for rank in range(d.ndomains):
        sub = d.subdomains[rank]
        sy, sx = d.shard_slices(rank)
        loc = data[sy, sx]
        r = fld.internal_region(rank)
        want = g[sub.global_.ystart:sub.global_.ystop,
                 sub.global_.xstart:sub.global_.xstop]
        np.testing.assert_array_equal(loc[r.slices()], want)
        # everything outside internal is zero (reference zero-fill)
        mask = np.zeros_like(loc, dtype=bool)
        mask[r.slices()] = True
        assert np.all(loc[~mask] == 0.0)

    # update_field: +1 on internal points only
    fld.data = fld.data + fld.internal_mask
    out = fld.gather_inner_data()
    np.testing.assert_array_equal(out, g + 1.0)


def test_gather_shape_and_dtype():
    grid = make_grid(7, 5, 4)
    fld = dl.Field(grid, dl.T_POINTS)
    out = fld.gather_inner_data()
    assert out.shape == (5, 7)
    assert out.dtype == np.dtype(grid.dtype)   # fp64 under the conftest


def test_global_sum_collectives():
    from dl_esm_inf_tpu.parallel import collectives as coll
    grid = make_grid(8, 8, 4)
    fld = dl.Field(grid, dl.T_POINTS,
                   init_global_data=np.full((8, 8), 2.0))
    assert coll.global_sum(fld.data * fld.internal_mask) == 128.0
    assert coll.global_max(fld.data) == 2.0
    assert coll.global_min(fld.data) == 0.0
