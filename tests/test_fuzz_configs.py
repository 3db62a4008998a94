"""Seeded random-configuration fuzz: decomposition exactness and the
hill halo oracle must hold for arbitrary domain shapes, process grids,
halo widths and alignments — not just the hand-picked test configs."""
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
