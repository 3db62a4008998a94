"""Grid construction: tmask handling, coordinates, PBC guards."""
import numpy as np
import pytest

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.core import layout


def test_tmask_edge_replication():
    """Boundary strips replicate the nearest supplied value
    (grid_mod.f90:415-431), including alignment padding."""
    gnx, gny = 6, 4
    tmask = np.ones((gny, gnx), dtype=np.int32)
    tmask[0, :] = 0          # south land row
    tmask[:, -1] = -1        # east outside column
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomains=2, align=8)
    dl.grid_init(grid, 1.0, 1.0, tmask)
    tm = np.asarray(grid.get_tmask())
    d = grid.decomp
    for rank in range(d.ndomains):
        sy, sx = d.shard_slices(rank)
        loc = tm[sy, sx]
        sub = d.subdomains[rank]
        r = sub.internal
        # internal values match the global tmask
        want = tmask[sub.global_.ystart:sub.global_.ystop,
                     sub.global_.xstart:sub.global_.xstop]
        np.testing.assert_array_equal(loc[r.slices()], want)
        # south halo row replicates the south-most supplied row
        if sub.global_.ystart == 0:
            np.testing.assert_array_equal(loc[r.ystart - 1, r.xstart:r.xstop],
                                          want[0])
    # east padding of the east-most shard replicates the -1 column
    sy, sx = d.shard_slices(1)
    loc = tm[sy, sx]
    r = d.subdomains[1].internal
    assert np.all(loc[r.ystart:r.ystop, r.xstop:] == -1)


def test_all_wet_default_tmask():
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(4, 4, ndomains=1)
    dl.grid_init(grid, 1.0, 1.0)
    assert np.all(np.asarray(grid.get_tmask()) == 1)


def test_coords_match_reference_formula():
    """xt = global 1-based index * dx, extended into halos
    (grid_mod.f90:536-556)."""
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(8, 6, ndomains=4, halo_width=1)
    dl.grid_init(grid, 2.0, 3.0)
    d = grid.decomp
    xt = grid.xt_1d()
    yt = grid.yt_1d()
    for rank in range(4):
        sub = d.subdomains[rank]
        sy, sx = d.shard_slices(rank)
        r = sub.internal
        # first internal column: (global 1-based index) * dx
        assert xt[sx][r.xstart] == (sub.global_.xstart + 1) * 2.0
        # halo column west of it is one dx less
        assert xt[sx][r.xstart - 1] == (sub.global_.xstart) * 2.0
        assert yt[sy][r.ystart] == (sub.global_.ystart + 1) * 3.0
    # 2D device arrays agree
    assert np.asarray(grid.xt)[0, 5] == xt[5]
    assert np.asarray(grid.yt)[3, 0] == yt[3]


def test_constant_grid_arrays():
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(4, 4, ndomains=1)
    dl.grid_init(grid, 2.0, 4.0)
    assert np.all(np.asarray(grid.dx_u) == 2.0)
    assert np.all(np.asarray(grid.dy_v) == 4.0)
    assert np.all(np.asarray(grid.area_t) == 8.0)
    assert np.all(np.asarray(grid.gphif) == 50.0)


def test_pbc_divisibility_guard():
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_PERIODIC, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    with pytest.raises(ValueError, match="periodic x"):
        grid.decompose(10, 8, ndomainx=4, ndomainy=1)  # 10 % 4 != 0


def test_decompose_uses_all_devices():
    import jax
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(16, 16)
    assert grid.decomp.ndomains == len(jax.devices())
    assert grid.mesh.size == len(jax.devices())


def test_layout_roundtrip():
    d = dl.decompose(13, 7, ndomains=6, align=4)
    g = np.arange(13 * 7, dtype=float).reshape(7, 13)
    st = layout.stack_global(d, g, mode="edge")
    np.testing.assert_array_equal(layout.unstack_internal(d, st), g)
    st0 = layout.stack_global(d, g, mode="zeros")
    np.testing.assert_array_equal(layout.unstack_internal(d, st0), g)
