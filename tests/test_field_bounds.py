"""Staggered-field bounds truth table.

Exhaustive check of the internal/whole-region logic that the reference
spreads over four offset-specific init routines
(field_mod.f90:652-1122) — SURVEY §7 'hard part #2' demands a truth
table, not faith.
"""
import numpy as np
import pytest

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.core.field import staggering_offsets


def make_grid(offset, bcs=(dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
              gnx=10, gny=8, ndom=1):
    grid = dl.Grid(dl.ARAKAWA_C, bcs, offset)
    grid.decompose(gnx, gny, ndomains=ndom)
    dl.grid_init(grid, 1.0, 1.0)
    return grid


# (offset, bc_periodic_x, bc_periodic_y, point) -> (off_x, off_y)
TRUTH = {
    # NE offset: all four point types share the T internal region
    # (field_mod.f90:769-772, 880-890, 985-995, 1108-1117)
    (dl.OFFSET_NE, False, False, dl.U_POINTS): (0, 0),
    (dl.OFFSET_NE, False, False, dl.V_POINTS): (0, 0),
    (dl.OFFSET_NE, False, False, dl.T_POINTS): (0, 0),
    (dl.OFFSET_NE, False, False, dl.F_POINTS): (0, 0),
    # SW offset, non-periodic (field_mod.f90:724-729, 839-843, 935-938,
    # 1044-1056)
    (dl.OFFSET_SW, False, False, dl.U_POINTS): (1, 0),
    (dl.OFFSET_SW, False, False, dl.V_POINTS): (0, 1),
    (dl.OFFSET_SW, False, False, dl.T_POINTS): (0, 0),
    (dl.OFFSET_SW, False, False, dl.F_POINTS): (1, 1),
    # SW offset, periodic in both axes: all types same extent as T
    # (field_mod.f90:694-711, 817-826, 1040-1053)
    (dl.OFFSET_SW, True, True, dl.U_POINTS): (0, 0),
    (dl.OFFSET_SW, True, True, dl.V_POINTS): (0, 0),
    (dl.OFFSET_SW, True, True, dl.T_POINTS): (0, 0),
    (dl.OFFSET_SW, True, True, dl.F_POINTS): (0, 0),
    # SW offset, periodic x only: U loses its x shift, V/F keep y shift
    (dl.OFFSET_SW, True, False, dl.U_POINTS): (0, 0),
    (dl.OFFSET_SW, True, False, dl.V_POINTS): (0, 1),
    (dl.OFFSET_SW, True, False, dl.F_POINTS): (0, 1),
    # SW offset, periodic y only (the mirror): V loses its y shift,
    # U/F keep the x shift — catches axis-asymmetry bugs the all- or
    # x-only-periodic rows cannot
    (dl.OFFSET_SW, False, True, dl.U_POINTS): (1, 0),
    (dl.OFFSET_SW, False, True, dl.V_POINTS): (0, 0),
    (dl.OFFSET_SW, False, True, dl.T_POINTS): (0, 0),
    (dl.OFFSET_SW, False, True, dl.F_POINTS): (1, 0),
    # NE offset with periodicity: bounds are offset-free regardless
    (dl.OFFSET_NE, True, False, dl.U_POINTS): (0, 0),
    (dl.OFFSET_NE, False, True, dl.V_POINTS): (0, 0),
}


@pytest.mark.parametrize("key,expect", sorted(TRUTH.items()))
def test_staggering_truth_table(key, expect):
    offset, px, py, points = key
    bcs = (dl.BC_PERIODIC if px else dl.BC_EXTERNAL,
           dl.BC_PERIODIC if py else dl.BC_EXTERNAL,
           dl.BC_NONE)
    # periodic axes need divisible extents
    grid = make_grid(offset, bcs, gnx=8, gny=8)
    assert staggering_offsets(grid, points) == expect


def test_internal_region_single_shard():
    grid = make_grid(dl.OFFSET_SW, gnx=10, gny=8)
    h = grid.decomp.halo
    u = dl.Field(grid, dl.U_POINTS)
    r = u.internal
    assert (r.xstart, r.xstop) == (h + 1, h + 10)
    assert (r.ystart, r.ystop) == (h, h + 8)
    # whole = internal +/- NBOUNDARY (field_mod.f90:604-622)
    w = u.whole
    assert w == r.grow(1)
    f = dl.Field(grid, dl.F_POINTS)
    assert (f.internal.xstart, f.internal.ystart) == (h + 1, h + 1)


def test_internal_region_multi_shard_sw_seamless():
    """Documented deviation: the SW +1 applies to the GLOBAL region, so
    interior shards keep full-width internal regions (no seam holes)."""
    grid = make_grid(dl.OFFSET_SW, gnx=8, gny=8, ndom=4)
    u = dl.Field(grid, dl.U_POINTS)
    d = grid.decomp
    h = d.halo
    # west shards: internal x starts at h+1; east shards at h
    for rank in range(4):
        ix, iy = d.rank_coords(rank)
        r = u.internal_region(rank)
        assert r.xstart == (h + 1 if ix == 0 else h)
    # total internal points = (gnx-1) * gny
    assert sum(u.internal_region(k).npts for k in range(4)) == 7 * 8
    m = u.internal_mask_np()
    assert int(m.sum()) == 7 * 8


def test_all_points_field():
    grid = make_grid(dl.OFFSET_NE, gnx=10, gny=8)
    fld = dl.Field(grid, dl.ALL_POINTS)
    r = fld.internal
    # full local array (reference field_init, field_mod.f90:640-646)
    assert (r.xstart, r.xstop) == (0, grid.nx)
    assert (r.ystart, r.ystop) == (0, grid.ny)
    assert fld.num_halos == 0


def test_mask_counts_match_regions():
    for ndom in (1, 4, 6):
        grid = make_grid(dl.OFFSET_NE, gnx=10, gny=9, ndom=ndom)
        for pts in (dl.T_POINTS, dl.U_POINTS, dl.V_POINTS, dl.F_POINTS):
            fld = dl.Field(grid, pts)
            n_mask = int(fld.internal_mask_np().sum())
            n_regions = sum(fld.internal_region(k).npts
                            for k in range(grid.decomp.ndomains))
            assert n_mask == n_regions == 90


def test_field_requires_initialised_grid():
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    with pytest.raises(RuntimeError):
        dl.Field(grid, dl.T_POINTS)
    grid.decompose(4, 4, ndomains=1)
    with pytest.raises(RuntimeError):
        dl.Field(grid, dl.T_POINTS)


def test_arakawa_b_rejected():
    with pytest.raises(NotImplementedError):
        dl.Grid(dl.ARAKAWA_B, (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                dl.OFFSET_NE)


def test_copy_set_free_field():
    grid = make_grid(dl.OFFSET_NE)
    a = dl.Field(grid, dl.T_POINTS)
    b = dl.Field(grid, dl.T_POINTS)
    dl.set_field(a, 3.0)
    assert np.all(a.get_data() == 3.0)
    dl.copy_field(a, b)
    assert np.all(b.get_data() == 3.0)
    dl.copy_field_patch(b, dl.Region(0, 2, 0, 2), dl.Region(4, 6, 4, 6))
    assert np.all(b.get_data()[4:6, 4:6] == 3.0)
    dl.free_field(a)
    assert a.data is None


def test_sub_region_read_write():
    """Analogue of tests/device_computation/test_device_io.f90: partial
    host<->device sync with sub-regions, robust to alignment padding."""
    grid = make_grid(dl.OFFSET_NE, gnx=5, gny=5)
    fld = dl.Field(grid, dl.T_POINTS)
    dl.set_field(fld, 0.0)
    # write 1.0 to a sub-block
    fld.write_to_device(dl.Region(2, 5, 2, 5), np.ones((3, 3)))
    # double everything "on device"
    fld.data = fld.data * 2.0
    quad = fld.read_from_device(dl.Region(3, 6, 3, 6))
    assert np.all(quad[:2, :2] == 2.0)      # was 1.0, doubled
    assert np.all(quad[2:, :] == 0.0)
    assert np.all(quad[:, 2:] == 0.0)
    # full sync still consistent
    full = fld.get_data()
    assert full[2, 2] == 2.0 and full[0, 0] == 0.0


def test_alignment_padding_grid():
    """DL_ESM_ALIGNMENT parity: padded shard, identical results."""
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(10, 10, ndomains=2, align=16)
    dl.grid_init(grid, 1.0, 1.0)
    assert grid.nx % 16 == 0
    fld = dl.Field(grid, dl.T_POINTS)
    m = fld.internal_mask_np()
    assert int(m.sum()) == 100
    fld.set_data(np.where(m, 1.0, -5.0))
    assert dl.field_checksum(fld) == 100.0
