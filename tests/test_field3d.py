"""Multi-level (3D) fields: the reference aborts on 3D-real exchange
(parallel_comms_mod.f90:1738-1742); here the level axis is a leading
dim of the same stacked sharded array — one exchange, checksum and
gather serve every level."""
import numpy as np
import pytest

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.testing import hill_stacked, init_field_hill


def make_grid(gnx=12, gny=10, ndom=4, halo=1, wrap=False):
    bcs = ((dl.BC_PERIODIC if wrap else dl.BC_EXTERNAL,) * 2
           + (dl.BC_NONE,))
    grid = dl.Grid(dl.ARAKAWA_C, bcs, dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomains=ndom, halo_width=halo)
    dl.grid_init(grid, 1.0, 1.0)
    return grid


def unique_levels(gny, gnx, nlev):
    base = np.arange(gny * gnx, dtype=float).reshape(gny, gnx)
    return np.stack([base + 10000.0 * k for k in range(nlev)])


def test_levels_exchange_equals_per_level_2d():
    """One 3D exchange == N independent 2D exchanges, level by level."""
    gnx, gny, nlev = 12, 10, 3
    grid = make_grid(gnx, gny)
    g = unique_levels(gny, gnx, nlev)
    f3 = dl.Field(grid, dl.T_POINTS, init_global_data=g, levels=nlev)
    f3.halo_exchange(1)
    for k in range(nlev):
        f2 = dl.Field(grid, dl.T_POINTS, init_global_data=g[k])
        f2.halo_exchange(1)
        np.testing.assert_array_equal(f3.get_data()[k], f2.get_data(),
                                      err_msg=f"level {k}")


def test_levels_checksum_gather_scatter():
    gnx, gny, nlev = 10, 8, 4
    grid = make_grid(gnx, gny, ndom=2)
    g = unique_levels(gny, gnx, nlev)
    f = dl.Field(grid, dl.T_POINTS, init_global_data=g, levels=nlev)
    # checksum sums |internal| over ALL levels
    want = sum(np.abs(g[k]).sum() for k in range(nlev))
    assert abs(f.checksum() - want) < 1e-6 * want
    # gather returns the (nlev, gny, gnx) global stack
    got = f.gather_inner_data()
    assert got.shape == (nlev, gny, gnx)
    np.testing.assert_array_equal(got, g)


def test_levels_periodic_wrap():
    gnx, gny, nlev = 12, 12, 2
    grid = make_grid(gnx, gny, ndom=4, wrap=True)
    g = unique_levels(gny, gnx, nlev)
    f = dl.Field(grid, dl.T_POINTS, init_global_data=g, levels=nlev)
    f.halo_exchange(1)
    for k in range(nlev):
        f2 = dl.Field(grid, dl.T_POINTS, init_global_data=g[k])
        f2.halo_exchange(1)
        np.testing.assert_array_equal(f.get_data()[k], f2.get_data(),
                                      err_msg=f"level {k}")


def test_levels_mixed_multi_exchange():
    """exchange_multi with mixed 2D and 3D fields — including two 3D
    fields with DIFFERENT level counts — in one program: the message
    grouping must keep unstackable shapes apart."""
    from dl_esm_inf_tpu.parallel.halo import exchange, exchange_multi
    gnx, gny, nlev = 12, 10, 2
    grid = make_grid(gnx, gny)
    g = unique_levels(gny, gnx, nlev)
    g4 = unique_levels(gny, gnx, 4) + 3.0
    f3 = dl.Field(grid, dl.T_POINTS, init_global_data=g, levels=nlev)
    f4 = dl.Field(grid, dl.T_POINTS, init_global_data=g4, levels=4)
    f2 = dl.Field(grid, dl.T_POINTS, init_global_data=g[0] + 7.0)
    outs = exchange_multi([f3.data, f2.data, f4.data], grid.mesh,
                          grid.halo_spec)
    for out, src in zip(outs, (f3, f2, f4)):
        want = exchange(src.data, grid.mesh, grid.halo_spec)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_levels_device_io_and_set_field():
    from dl_esm_inf_tpu.core.field import set_field
    grid = make_grid(10, 8, ndom=1)
    f = dl.Field(grid, dl.T_POINTS, levels=3)
    set_field(f, 2.0)
    assert f.get_data().shape[0] == 3 and np.all(f.get_data() == 2.0)
    f.write_to_device(dl.Region(2, 5, 2, 5), np.full((3, 3, 3), 9.0))
    quad = f.read_from_device(dl.Region(2, 5, 2, 5))
    assert quad.shape == (3, 3, 3) and np.all(quad == 9.0)


def test_levels_overdecomposed():
    """3D exchange through the over-decomposed (tiles-per-device)
    path."""
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(24, 24, ndomainx=4, ndomainy=4, halo_width=1)
    dl.grid_init(grid, 1.0, 1.0)
    g = unique_levels(24, 24, 2)
    f = dl.Field(grid, dl.T_POINTS, init_global_data=g, levels=2)
    f.halo_exchange(1)
    for k in range(2):
        f2 = dl.Field(grid, dl.T_POINTS, init_global_data=g[k])
        f2.halo_exchange(1)
        np.testing.assert_array_equal(f.get_data()[k], f2.get_data(),
                                      err_msg=f"level {k}")


def test_levels_checkpoint_roundtrips(tmp_path):
    """npz and orbax checkpoints carry multi-level fields; the orbax
    restore is mesh-elastic for them too."""
    from dl_esm_inf_tpu.utils import checkpoint
    gnx, gny, nlev = 16, 16, 3
    grid4 = make_grid(gnx, gny, ndom=4)
    g = unique_levels(gny, gnx, nlev)
    f = dl.Field(grid4, dl.T_POINTS, init_global_data=g, levels=nlev)

    checkpoint.save_fields(str(tmp_path / "ck.npz"), {"f": f})
    fb = dl.Field(grid4, dl.T_POINTS, levels=nlev)
    checkpoint.load_fields(str(tmp_path / "ck.npz"), {"f": fb})
    np.testing.assert_array_equal(fb.gather_inner_data(), g)

    checkpoint.save_fields_orbax(str(tmp_path / "cko"), {"f": f})
    grid8 = make_grid(gnx, gny, ndom=8)
    fc = dl.Field(grid8, dl.T_POINTS, levels=nlev)
    checkpoint.load_fields_orbax(str(tmp_path / "cko"), {"f": fc})
    np.testing.assert_array_equal(fc.gather_inner_data(), g)


def test_levels_invoke_and_schedule():
    """The metadata layer (invoke + Schedule) runs on multi-level
    fields: the level axis rides through the shard_map specs and the
    2D masks broadcast over it."""
    from dl_esm_inf_tpu.api.kernel_meta import (GO_READ, GO_WRITE, GO_CT,
                                                Schedule, go_arg,
                                                go_stencil, invoke,
                                                kernel)
    from dl_esm_inf_tpu.ops import stencils as st

    @kernel(args=[go_arg(GO_WRITE, GO_CT),
                  go_arg(GO_READ, GO_CT, go_stencil(0, 11, 0))])
    def east(out, x):
        return st.xp(x)

    gnx, gny, nlev = 16, 12, 2
    grid = make_grid(gnx, gny, ndom=4)
    g = unique_levels(gny, gnx, nlev)
    f = dl.Field(grid, dl.T_POINTS, init_global_data=g, levels=nlev)
    out = dl.Field(grid, dl.T_POINTS, levels=nlev)
    invoke(east, out, f)
    got = out.gather_inner_data()
    # interior columns shift east by one; seams must be invisible
    np.testing.assert_array_equal(got[:, :, :-1], g[:, :, 1:])

    out2 = dl.Field(grid, dl.T_POINTS, levels=nlev)
    Schedule((east, out2, f))()
    np.testing.assert_array_equal(out2.gather_inner_data(), got)


def test_levels_validation():
    grid = make_grid()
    with pytest.raises(ValueError, match="levels"):
        dl.Field(grid, dl.T_POINTS, levels=0)
    with pytest.raises(ValueError, match="init_global_data"):
        dl.Field(grid, dl.T_POINTS, levels=2,
                 init_global_data=np.zeros((10, 12)))
