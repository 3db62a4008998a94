"""Decomposition unit tests.

Covers the process-grid factorisation and both splitting algorithms —
pure-function coverage the reference lacks (SURVEY §4: 'no pure unit
tests of go_decompose').
"""
import pytest

from dl_esm_inf_tpu.core.decomposition import (
    Decomposition, choose_process_grid, decompose, reference_subdomains)


@pytest.mark.parametrize("ndom,xlen,ylen,expect", [
    # floor(sqrt(n)) decremented to a divisor, oriented to the domain
    (1, 10, 10, (1, 1)),
    (2, 10, 4, (2, 1)),    # x-split: longer x domain
    (2, 4, 10, (1, 2)),    # y-split
    (4, 10, 10, (2, 2)),
    (6, 10, 10, (2, 3)),   # ylen >= xlen -> nprocy >= nprocx
    (6, 20, 10, (3, 2)),
    (7, 10, 10, (1, 7)),   # prime
    (12, 10, 10, (3, 4)),
    (8, 100, 10, (4, 2)),
])
def test_choose_process_grid(ndom, xlen, ylen, expect):
    assert choose_process_grid(ndom, xlen, ylen) == expect


@pytest.mark.parametrize("gnx,gny,px,py", [
    (10, 4, 2, 1), (4, 10, 1, 2), (10, 10, 2, 2), (10, 10, 2, 3),
    (17, 13, 3, 2), (5, 5, 5, 5),
])
def test_reference_subdomains_tile_exactly(gnx, gny, px, py):
    """Uneven reference splitting covers the domain exactly, no overlap."""
    subs = reference_subdomains(gnx, gny, px, py)
    assert len(subs) == px * py
    covered = [[0] * gnx for _ in range(gny)]
    for s in subs:
        g = s.global_
        assert s.internal.nx == g.nx and s.internal.ny == g.ny
        for j in range(g.ystart, g.ystop):
            for i in range(g.xstart, g.xstop):
                covered[j][i] += 1
    assert all(c == 1 for row in covered for c in row)
    # Remainder spread: widths differ by at most one
    widths = sorted({s.global_.nx for s in subs})
    heights = sorted({s.global_.ny for s in subs})
    assert widths[-1] - widths[0] <= 1
    assert heights[-1] - heights[0] <= 1


@pytest.mark.parametrize("gnx,gny,ndom", [
    (10, 4, 2), (4, 10, 2), (10, 10, 4), (10, 10, 6), (258, 258, 1),
    (17, 13, 6),
])
def test_uniform_decompose_covers_domain(gnx, gny, ndom):
    d = decompose(gnx, gny, ndomains=ndom)
    assert d.ndomains == ndom
    # uniform tiles cover the padded domain; in-domain parts tile exactly
    covered = [[0] * gnx for _ in range(gny)]
    for s in d.subdomains:
        g = s.global_
        for j in range(g.ystart, g.ystop):
            for i in range(g.xstart, g.xstop):
                covered[j][i] += 1
    assert all(c == 1 for row in covered for c in row)
    # only the last shard of an axis may be short
    for r, s in enumerate(d.subdomains):
        ix, iy = d.rank_coords(r)
        if ix < d.nprocx - 1:
            assert s.global_.nx == d.tile_nx
        if iy < d.nprocy - 1:
            assert s.global_.ny == d.tile_ny
    # local alloc includes the halo ring
    assert d.local_ny == d.tile_ny + 2 * d.halo
    assert d.local_nx >= d.tile_nx + 2 * d.halo


def test_alignment_padding():
    """DL_ESM_ALIGNMENT analogue: contiguous dim padded to a multiple."""
    d = decompose(10, 10, ndomains=2, align=8)
    assert d.local_nx % 8 == 0
    assert d.local_nx >= d.tile_nx + 2 * d.halo
    d1 = decompose(10, 10, ndomains=2, align=1)
    assert d1.local_nx == d1.tile_nx + 2


def test_halo_width_parameter():
    d = decompose(16, 16, ndomains=4, halo_width=3)
    assert d.halo == 3
    s = d.subdomains[0]
    assert s.internal.xstart == 3 and s.internal.ystart == 3
    with pytest.raises(ValueError):
        decompose(16, 16, ndomains=4, halo_width=0)


def test_explicit_process_grid():
    d = decompose(12, 12, ndomainx=4, ndomainy=2)
    assert (d.nprocx, d.nprocy) == (4, 2)
    with pytest.raises(ValueError):
        decompose(12, 12, ndomains=4, ndomainx=2)


def test_imbalance_stats():
    d = decompose(10, 10, ndomains=4)
    st = d.imbalance_stats()
    assert st["max_pts"] == 25 and st["min_pts"] == 25
    assert st["imbalance_pct"] == 0.0
    assert st["max_width"] == d.tile_nx + 2
    d2 = decompose(11, 11, ndomains=4)  # 6x6 tiles, last shard 5x5
    st2 = d2.imbalance_stats()
    assert st2["max_pts"] == 36 and st2["min_pts"] == 25


def test_rank_mapping_roundtrip():
    d = decompose(10, 10, ndomains=6)
    for r in range(6):
        ix, iy = d.rank_coords(r)
        assert d.coords_rank(ix, iy) == r
