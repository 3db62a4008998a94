import pytest

from dl_esm_inf_tpu.core.region import Region, Subdomain


def test_region_basics():
    r = Region(2, 6, 1, 4)
    assert r.nx == 4 and r.ny == 3 and r.npts == 12
    assert not r.is_empty()
    assert r.slices() == (slice(1, 4), slice(2, 6))
    assert r.contains(2, 1) and r.contains(5, 3)
    assert not r.contains(6, 1) and not r.contains(2, 4)


def test_region_grow_shift():
    r = Region(2, 6, 1, 4)
    assert r.grow(1) == Region(1, 7, 0, 5)
    assert r.grow(1).grow(-1) == r
    assert r.shift(dx=3) == Region(5, 9, 1, 4)
    assert r.shift(dy=-1) == Region(2, 6, 0, 3)


def test_region_intersect_empty():
    a = Region(0, 4, 0, 4)
    b = Region(4, 8, 0, 4)
    assert a.intersect(b).is_empty()
    c = Region(2, 6, 2, 6)
    assert a.intersect(c) == Region(2, 4, 2, 4)


def test_region_hashable_static():
    """Regions must be usable as static jit arguments."""
    assert hash(Region(0, 1, 0, 1)) == hash(Region(0, 1, 0, 1))
    d = {Region(0, 1, 0, 1): "a"}
    assert d[Region(0, 1, 0, 1)] == "a"


def test_subdomain():
    s = Subdomain(internal=Region(1, 5, 1, 3), global_=Region(4, 8, 0, 2))
    assert s.nx == 4 and s.ny == 2
