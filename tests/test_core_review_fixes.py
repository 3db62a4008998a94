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


def numpy_exchange(stacked, spec):
    """Independent slicing transcription of the two-phase depth-1
    exchange on the stacked layout (non-periodic)."""
    h, d = spec.halo, 1
    w, hgt = spec.tile_nx, spec.tile_ny
    px, py = spec.nprocx, spec.nprocy
    lx, ly = spec.local_nx, spec.local_ny
    a = np.array(stacked)
    for iy in range(py):            # x phase: interior edge columns
        for ix in range(px):
            r0, c0 = iy * ly, ix * lx
            if ix > 0:
                a[r0:r0 + ly, c0 + h - d:c0 + h] = \
                    a[r0:r0 + ly, c0 - lx + h + w - d:c0 - lx + h + w]
            if ix < px - 1:
                a[r0:r0 + ly, c0 + h + w:c0 + h + w + d] = \
                    a[r0:r0 + ly, c0 + lx + h:c0 + lx + h + d]
    for iy in range(py):            # y phase: full-width rows (corners)
        for ix in range(px):
            r0, c0 = iy * ly, ix * lx
            if iy > 0:
                a[r0 + h - d:r0 + h, c0:c0 + lx] = \
                    a[r0 - ly + h + hgt - d:r0 - ly + h + hgt, c0:c0 + lx]
            if iy < py - 1:
                a[r0 + h + hgt:r0 + h + hgt + d, c0:c0 + lx] = \
                    a[r0 + ly + h:r0 + ly + h + d, c0:c0 + lx]
    return a


def test_mixed_dtype_exchange_exact():
    """int32 halos above 2^24 must survive a coalesced exchange with
    float32/bfloat16 companions (upcasting through a shared message
    would round them) — checked against an INDEPENDENT NumPy
    transcription, not the library's own single-field path."""
    grid = make_grid()
    shape = grid.array_shape
    big = 1 << 25
    rng = np.random.default_rng(11)
    ints_np = (np.arange(shape[0] * shape[1], dtype=np.int32) + big
               ).reshape(shape)
    flts_np = rng.normal(size=shape).astype(np.float32)
    bf_np = np.full(shape, 2.0, np.float32)
    ints = jax.device_put(jnp.asarray(ints_np), grid.sharding)
    flts = jax.device_put(jnp.asarray(flts_np), grid.sharding)
    bf = jax.device_put(jnp.asarray(bf_np, jnp.bfloat16), grid.sharding)

    got_i, got_f, got_b = exchange_multi([ints, flts, bf], grid.mesh,
                                         grid.halo_spec)
    spec = grid.halo_spec
    np.testing.assert_array_equal(np.asarray(got_i),
                                  numpy_exchange(ints_np, spec))
    np.testing.assert_array_equal(np.asarray(got_f),
                                  numpy_exchange(flts_np, spec))
    np.testing.assert_array_equal(
        np.asarray(got_b.astype(jnp.float32)),
        numpy_exchange(bf_np, spec))
    assert got_i.dtype == jnp.int32 and got_b.dtype == jnp.bfloat16
    assert got_f.dtype == jnp.float32


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
    h = spec.halo
    # west halo column of the west-most shards must be LAND (the wrap
    # partner is the global east edge), not replicated ocean
    assert np.all(tm[:, h - 1] == 0)


def test_empty_shard_rejected():
    with pytest.raises(ValueError, match="empty"):
        dl.decompose(5, 5, ndomainx=4, ndomainy=1)


def test_bad_precision_name():
    with pytest.raises(ValueError, match="not understood"):
        dl.set_working_precision("fp32x")
