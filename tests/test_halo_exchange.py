"""Halo-exchange correctness: the hill oracle.

Port of tests/dist_mem/test_halos.f90 — every depth-1 (and, extension,
depth-2) halo point adjacent to a neighbouring shard must equal the
analytic per-global-position value after one exchange; boundary strips
with no neighbour must be untouched.  Run on forced multi-device CPU
meshes (the analogue of `mpirun -np N`, SURVEY §4).
"""
import numpy as np
import pytest

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.testing import hill_stacked, init_field_hill

TOL = 1.0e-8
POISON = -666.0


def make_grid(gnx, gny, ndom, halo_width=1, bcs=None, offset=dl.OFFSET_NE):
    grid = dl.Grid(dl.ARAKAWA_C,
                   bcs or (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   offset)
    grid.decompose(gnx, gny, ndomains=ndom, halo_width=halo_width)
    dl.grid_init(grid, 1.0, 1.0)
    return grid


def check_hill_halos(field, depth=1):
    """Port of check_hill_halos (test_halos.f90:191-265), all four sides,
    generalised to depth > 1 and to also assert no-neighbour strips are
    NOT overwritten."""
    d = field.grid.decomp
    data = field.get_data()
    oracle = hill_stacked(field)
    for rank in range(d.ndomains):
        sub = d.subdomains[rank]
        sy, sx = d.shard_slices(rank)
        loc = data[sy, sx]
        orc = oracle[sy, sx]
        r = field.internal_region(rank)
        for dd in range(1, depth + 1):
            # in_domain: a deep halo cell whose GLOBAL position falls
            # beyond the domain (a remainder neighbour shallower than
            # the depth) legitimately receives the neighbour's masked
            # padding — the pad-and-mask contract says its content is
            # unspecified, so it is excluded from the oracle.
            strips = {
                "-x": (slice(r.ystart, r.ystop), r.xstart - dd,
                       sub.global_.xstart > 0,
                       sub.global_.xstart - dd >= 0),
                "+x": (slice(r.ystart, r.ystop), r.xstop - 1 + dd,
                       sub.global_.xstop < field.grid.global_nx,
                       sub.global_.xstop - 1 + dd < field.grid.global_nx),
                "-y": (r.ystart - dd, slice(r.xstart, r.xstop),
                       sub.global_.ystart > 0,
                       sub.global_.ystart - dd >= 0),
                "+y": (r.ystop - 1 + dd, slice(r.xstart, r.xstop),
                       sub.global_.ystop < field.grid.global_ny,
                       sub.global_.ystop - 1 + dd < field.grid.global_ny),
            }
            for name, (yy, xx, has_neighbour, in_domain) in strips.items():
                got = loc[yy, xx]
                if has_neighbour and in_domain:
                    want = orc[yy, xx]
                    assert np.allclose(got, want, atol=TOL), (
                        f"rank {rank} {name} depth {dd} halo wrong: "
                        f"{got} != {want}")
                elif not has_neighbour:
                    assert np.all(got == POISON), (
                        f"rank {rank} {name} halo has no neighbour but was "
                        f"overwritten: {got}")


@pytest.mark.parametrize("gnx,gny,ndom", [
    (10, 4, 2),    # x-split (reference Makefile:64-66)
    (4, 10, 2),    # y-split
    (10, 10, 4),   # 2x2
    (10, 10, 6),   # non-square 2x3 process grid
    (10, 10, 1),   # serial: nothing exchanged, nothing clobbered
    (17, 13, 6),   # remainder padding on east/north shards
])
@pytest.mark.parametrize("points", [dl.T_POINTS, dl.U_POINTS, dl.V_POINTS,
                                    dl.F_POINTS])
def test_hill_halos(gnx, gny, ndom, points):
    grid = make_grid(gnx, gny, ndom)
    fld = dl.Field(grid, points)
    init_field_hill(fld, POISON)
    fld.halo_exchange(1)
    check_hill_halos(fld, depth=1)


def test_hill_halos_depth2():
    """Extension over the reference: depth-2 exchange (the reference
    hardwires depth 1, parallel_comms_mod.f90:48)."""
    grid = make_grid(12, 12, 4, halo_width=2)
    for points in (dl.T_POINTS, dl.U_POINTS):
        fld = dl.Field(grid, points)
        init_field_hill(fld, POISON)
        fld.halo_exchange(2)
        check_hill_halos(fld, depth=2)


def test_depth_validation():
    grid = make_grid(10, 10, 4, halo_width=1)
    fld = dl.Field(grid, dl.T_POINTS)
    with pytest.raises(ValueError):
        fld.halo_exchange(2)
    with pytest.raises(ValueError):
        fld.halo_exchange(0)


def test_corners_propagate():
    """Diagonal-corner values must arrive (the reference needs explicit
    corner messages, parallel_comms_mod.f90:988-1170; here phase
    sequencing does it)."""
    grid = make_grid(8, 8, 4)
    fld = dl.Field(grid, dl.T_POINTS)
    init_field_hill(fld, POISON)
    fld.halo_exchange(1)
    data = fld.get_data()
    oracle = hill_stacked(fld)
    d = grid.decomp
    # rank 0 is the SW shard; its NE corner halo cell comes from rank 3.
    sy, sx = d.shard_slices(0)
    r = fld.internal_region(0)
    got = data[sy, sx][r.ystop, r.xstop]
    want = oracle[sy, sx][r.ystop, r.xstop]
    assert abs(got - want) < TOL


@pytest.mark.parametrize("ndom", [1, 2, 4])
def test_periodic_wraparound(ndom):
    """PBC support with any shard count — capability the reference lacks
    (grid_mod.f90:437-442).  Halo cells beyond the global edge must hold
    the value from the opposite side of the domain."""
    gnx = gny = 8
    grid = make_grid(gnx, gny, ndom,
                     bcs=(dl.BC_PERIODIC, dl.BC_PERIODIC, dl.BC_NONE))
    fld = dl.Field(grid, dl.T_POINTS)
    # unique value per global cell
    vals = np.arange(gnx * gny, dtype=float).reshape(gny, gnx)
    fld2 = dl.Field(grid, dl.T_POINTS, init_global_data=vals)
    fld.data = fld2.data
    fld.halo_exchange(1)
    data = fld.get_data()
    d = grid.decomp
    for rank in range(d.ndomains):
        sub = d.subdomains[rank]
        sy, sx = d.shard_slices(rank)
        loc = data[sy, sx]
        r = fld.internal_region(rank)
        g = sub.global_
        # west halo
        want = vals[np.arange(g.ystart, g.ystop) % gny,
                    (g.xstart - 1) % gnx]
        np.testing.assert_allclose(loc[r.ystart:r.ystop, r.xstart - 1], want)
        # east halo
        want = vals[np.arange(g.ystart, g.ystop) % gny, g.xstop % gnx]
        np.testing.assert_allclose(loc[r.ystart:r.ystop, r.xstop], want)
        # south halo
        want = vals[(g.ystart - 1) % gny, np.arange(g.xstart, g.xstop) % gnx]
        np.testing.assert_allclose(loc[r.ystart - 1, r.xstart:r.xstop], want)
        # north halo
        want = vals[g.ystop % gny, np.arange(g.xstart, g.xstop) % gnx]
        np.testing.assert_allclose(loc[r.ystop, r.xstart:r.xstop], want)
        # corner across the periodic seam
        np.testing.assert_allclose(
            loc[r.ystart - 1, r.xstart - 1],
            vals[(g.ystart - 1) % gny, (g.xstart - 1) % gnx])


def test_exchange_multi_matches_single():
    grid = make_grid(10, 10, 4)
    f1 = dl.Field(grid, dl.T_POINTS)
    f2 = dl.Field(grid, dl.U_POINTS)
    init_field_hill(f1)
    init_field_hill(f2)
    a1, a2 = f1.data, f2.data
    from dl_esm_inf_tpu.parallel.halo import exchange, exchange_multi
    outs = exchange_multi([a1, a2], grid.mesh, grid.halo_spec, 1)
    np.testing.assert_array_equal(
        np.asarray(outs[0]), np.asarray(exchange(a1, grid.mesh,
                                                 grid.halo_spec, 1)))
    np.testing.assert_array_equal(
        np.asarray(outs[1]), np.asarray(exchange(a2, grid.mesh,
                                                 grid.halo_spec, 1)))


def test_exchange_3d_and_int():
    """Capabilities the reference aborts on (parallel_comms_mod.f90:
    1693-1742): 3D-real and integer halo exchange."""
    import jax
    from jax.sharding import PartitionSpec as P
    from dl_esm_inf_tpu.parallel.halo import exchange_fn
    grid = make_grid(8, 8, 4)
    spec = grid.halo_spec
    d = grid.decomp
    # 3D: 5 vertical levels, level k holds (global value + 1000*k)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    base = dl.Field(grid, dl.T_POINTS, init_global_data=vals)
    lvl = np.stack([np.asarray(base.data) + 1000.0 * k for k in range(5)])
    lvl3 = jax.device_put(
        lvl, jax.sharding.NamedSharding(grid.mesh, P(None, "y", "x")))
    fn = jax.jit(jax.shard_map(exchange_fn(spec, 1), mesh=grid.mesh,
                               in_specs=P(None, "y", "x"),
                               out_specs=P(None, "y", "x")))
    out = np.asarray(fn(lvl3))
    # east halo of rank 0 must hold rank 1's first internal column at
    # every level
    sy, sx = d.shard_slices(0)
    r = base.internal_region(0)
    for k in range(5):
        want = vals[0:4, 4] + 1000.0 * k   # rank 1 internal col 0
        np.testing.assert_array_equal(
            out[k][sy, sx][r.ystart:r.ystop, r.xstop], want)
    # integer exchange
    arr = (np.asarray(base.data)).astype(np.int32)
    iarr = jax.device_put(arr, grid.sharding)
    fn2 = jax.jit(jax.shard_map(exchange_fn(spec, 1), mesh=grid.mesh,
                                in_specs=P("y", "x"),
                                out_specs=P("y", "x")))
    out2 = np.asarray(fn2(iarr))
    assert out2.dtype == np.int32
    np.testing.assert_array_equal(
        out2[sy, sx][r.ystart:r.ystop, r.xstop], vals[0:4, 4].astype(np.int32))


def test_exchange_multi_mixed_dtype():
    """Coalesced multi-field exchange with mixed dtypes round-trips each
    field in its own dtype."""
    import jax
    from jax.sharding import PartitionSpec as P
    from dl_esm_inf_tpu.parallel.halo import exchange_multi_fn
    grid = make_grid(8, 8, 4)
    vals = np.arange(64, dtype=float).reshape(8, 8)
    f = dl.Field(grid, dl.T_POINTS, init_global_data=vals)
    a32 = f.data.astype(np.float32)
    a64 = f.data
    fn = jax.jit(jax.shard_map(
        lambda t: exchange_multi_fn(grid.halo_spec, 1)(t),
        mesh=grid.mesh, in_specs=((P("y", "x"),) * 2,),
        out_specs=(P("y", "x"),) * 2))
    o32, o64 = fn((a32, a64))
    assert o32.dtype == np.float32 and o64.dtype == np.float64
    d = grid.decomp
    sy, sx = d.shard_slices(0)
    r = f.internal_region(0)
    np.testing.assert_array_equal(
        np.asarray(o64)[sy, sx][r.ystart:r.ystop, r.xstop], vals[0:4, 4])
