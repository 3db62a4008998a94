"""Seeded random-configuration fuzz: decomposition exactness and the
hill halo oracle must hold for arbitrary domain shapes, process grids,
halo widths and alignments — not just the hand-picked test configs."""
import jax
import numpy as np
import pytest

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.testing import init_field_hill
from test_halo_exchange import check_hill_halos


def random_configs(n, seed=2024):
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n:
        gnx = int(rng.integers(6, 40))
        gny = int(rng.integers(6, 40))
        ndom = int(rng.choice([1, 2, 3, 4, 6, 8]))
        halo = int(rng.integers(1, 4))
        align = int(rng.choice([1, 1, 4, 8]))
        # every shard needs >= 1 row/col
        from dl_esm_inf_tpu.core.decomposition import _cdiv
        try:
            d = dl.decompose(gnx, gny, ndomains=ndom, halo_width=halo,
                             align=align)
        except ValueError:
            continue
        out.append((gnx, gny, ndom, halo, align))
    return out


def random_overdecomp_configs(n, seed=77):
    """Configs whose process grid EXCEEDS the 8 devices, with random
    halo depth and optional multi-level fields."""
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n:
        gnx = int(rng.integers(12, 48))
        gny = int(rng.integers(12, 48))
        ndx = int(rng.integers(1, 7))
        ndy = int(rng.integers(1, 7))
        if ndx * ndy <= 8:
            continue
        halo = int(rng.integers(1, 4))
        depth = int(rng.integers(1, halo + 1))
        levels = int(rng.choice([0, 0, 2, 3]))
        try:
            dl.decompose(gnx, gny, ndomainx=ndx, ndomainy=ndy,
                         halo_width=halo)
        except ValueError:
            continue
        out.append((gnx, gny, ndx, ndy, halo, depth, levels))
    return out


@pytest.mark.parametrize("cfg", random_overdecomp_configs(8))
def test_random_overdecomposed_halo_oracle(cfg):
    """The hill oracle over random OVER-DECOMPOSED process grids (up to
    36 logical tiles on the 8 devices), random exchange depth, and
    randomly multi-level fields."""
    gnx, gny, ndx, ndy, halo, depth, levels = cfg
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomainx=ndx, ndomainy=ndy, halo_width=halo)
    dl.grid_init(grid, 1.0, 1.0)
    if levels:
        f2 = dl.Field(grid, dl.T_POINTS)
        init_field_hill(f2)
        base = f2.get_data()
        f3 = dl.Field(grid, dl.T_POINTS, levels=levels)
        f3.set_data(np.stack([base] * levels))
        f3.halo_exchange(depth)
        f2.halo_exchange(depth)
        for k in range(levels):
            np.testing.assert_array_equal(f3.get_data()[k], f2.get_data(),
                                          err_msg=f"{cfg} level {k}")
        f2.data = jax.device_put(jax.numpy.asarray(f3.get_data()[0]),
                                 grid.sharding)
        check_hill_halos(f2, depth=depth)
    else:
        fld = dl.Field(grid, dl.T_POINTS)
        init_field_hill(fld)
        fld.halo_exchange(depth)
        check_hill_halos(fld, depth=depth)


@pytest.mark.parametrize("cfg", random_configs(12))
def test_random_config_tiling_and_halo_oracle(cfg):
    gnx, gny, ndom, halo, align = cfg
    d = dl.decompose(gnx, gny, ndomains=ndom, halo_width=halo,
                     align=align)
    # subdomains tile the global domain exactly (cover + no overlap)
    cover = np.zeros((gny, gnx), dtype=int)
    for s in d.subdomains:
        g = s.global_
        cover[g.ystart:g.ystop, g.xstart:g.xstop] += 1
    assert np.all(cover == 1), cfg

    # hill halo oracle: every exchanged halo point matches the analytic
    # global-position value (the reference's decisive distributed test)
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomains=ndom, halo_width=halo, align=align)
    dl.grid_init(grid, 1.0, 1.0)
    fld = dl.Field(grid, dl.T_POINTS)
    init_field_hill(fld)
    fld.halo_exchange(1)
    check_hill_halos(fld, depth=1)
