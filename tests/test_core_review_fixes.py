"""Regression tests for core bugs found by adversarial review:
mixed-dtype exchange corruption, multi-shard apply_periodic_bcs,
stale grid caches on re-decompose, periodic tmask seams, empty shards,
precision-name validation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.parallel.halo import exchange, exchange_multi


def make_grid(gnx=16, gny=24, ndom=4, wrap=False, **kw):
    bc = dl.BC_PERIODIC if wrap else dl.BC_EXTERNAL
    grid = dl.Grid(dl.ARAKAWA_C, (bc, bc, dl.BC_NONE), dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomains=ndom, **kw)
    dl.grid_init(grid, 1.0, 1.0)
    return grid


def test_mixed_dtype_exchange_exact():
    """int32 halos above 2^24 must survive a coalesced exchange with a
    float32 companion field (upcasting through f32 would round them)."""
    grid = make_grid()
    shape = grid.array_shape
    big = 1 << 25
    ints = jax.device_put(
        (jnp.arange(shape[0] * shape[1], dtype=jnp.int32) + big
         ).reshape(shape), grid.sharding)
    flts = jax.device_put(jnp.ones(shape, jnp.float32), grid.sharding)
    bf = jax.device_put(jnp.full(shape, 2.0, jnp.bfloat16), grid.sharding)

    got_i, got_f, got_b = exchange_multi([ints, flts, bf], grid.mesh,
                                         grid.halo_spec)
    want_i = exchange(ints, grid.mesh, grid.halo_spec)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    assert got_i.dtype == jnp.int32 and got_b.dtype == jnp.bfloat16


def test_apply_periodic_bcs_multishard_is_safe():
    """On a split periodic axis the wrap rides the exchange; the local
    wrap descriptors must be empty so apply_periodic_bcs cannot
    overwrite seam halos with the wrong shard's data."""
    grid = make_grid(8, 8, ndom=4, wrap=True)
    vals = np.arange(64, dtype=np.float64).reshape(8, 8)
    fld = dl.Field(grid, dl.T_POINTS, init_global_data=vals)
    fld.halo_exchange(1)
    before = np.asarray(fld.data).copy()
    assert fld.num_halos == 0      # both axes are split
    fld.apply_periodic_bcs()          # must be a no-op
    np.testing.assert_array_equal(np.asarray(fld.data), before)

    # single-shard periodic still gets the serial wrap descriptors
    g1 = make_grid(8, 8, ndom=1, wrap=True)
    f1 = dl.Field(g1, dl.T_POINTS, init_global_data=vals)
    assert f1.num_halos == 4


def test_redecompose_clears_caches():
    """Re-decomposing the same Grid must invalidate region masks and
    initialisation state (stale masks silently corrupt checksums)."""
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(9, 10, ndomains=2)
    dl.grid_init(grid, 1.0, 1.0)
    f = dl.Field(grid, dl.T_POINTS, init_global_data=np.ones((10, 9)))
    assert abs(f.checksum() - 90.0) < 1e-9

    grid.decompose(10, 10, ndomains=2)   # same stacked shape
    with pytest.raises(RuntimeError):
        dl.Field(grid, dl.T_POINTS)      # init() required again
    dl.grid_init(grid, 1.0, 1.0)
    f2 = dl.Field(grid, dl.T_POINTS, init_global_data=np.ones((10, 10)))
    assert abs(f2.checksum() - 100.0) < 1e-9


def test_periodic_tmask_seam_wraps():
    """tmask halo cells on a periodic axis hold the WRAP partner's
    values (edge replication would let flux through seam land)."""
    gnx = gny = 8
    tmask = np.ones((gny, gnx), dtype=np.int32)
    tmask[:, -1] = 0                  # land column at the east edge
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_PERIODIC, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomainx=2, ndomainy=2)
    dl.grid_init(grid, 1.0, 1.0, tmask)
    tm = np.asarray(grid.tmask)
    spec = grid.halo_spec
    h, lx = spec.halo, spec.local_nx
    # west halo column of the west-most shards must be LAND (the wrap
    # partner is the global east edge), not replicated ocean
    assert np.all(tm[:, h - 1] == 0)


def test_empty_shard_rejected():
    with pytest.raises(ValueError, match="empty"):
        dl.decompose(5, 5, ndomainx=4, ndomainy=1)


def test_bad_precision_name():
    with pytest.raises(ValueError, match="not understood"):
        dl.set_working_precision("fp32x")
