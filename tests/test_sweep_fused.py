"""Fused-transport sweep: the remote-DMA halo exchange INSIDE the
stencil-sweep kernel (ops/sweep.py exchange_spec) vs the ppermute path.

jax 0.9's interpret mode emulates remote DMA only under a single named
mesh axis (probed: dma_start_p raises NotImplementedError otherwise),
so — as with tests/test_halo_pallas.py — each axis is driven under a 1D
mesh with logical peer ids and compared against the ppermute exchange /
the ppermute-transport model on the same data.  On hardware the same
kernel runs under the full ('y','x') mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.ops.sweep import make_stencil_sweep
from dl_esm_inf_tpu.parallel.halo import exchange


def make_grid(gnx, gny, nx, ny, wrap_x=False, wrap_y=False, halo=8):
    bx = dl.BC_PERIODIC if wrap_x else dl.BC_EXTERNAL
    by = dl.BC_PERIODIC if wrap_y else dl.BC_EXTERNAL
    grid = dl.Grid(dl.ARAKAWA_C, (bx, by, dl.BC_NONE), dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomainx=nx, ndomainy=ny, halo_width=halo,
                   align_y=8)
    dl.grid_init(grid, 1.0, 1.0)
    return grid


def unique_fields(grid, n=2, dtype=jnp.float64):
    shape = grid.array_shape
    base = np.arange(shape[0] * shape[1], dtype=np.float64).reshape(shape)
    return [jax.device_put(jnp.asarray(base + 1000.0 * k, dtype),
                           grid.sharding) for k in range(n)]


def mesh_1d(grid):
    spec = grid.halo_spec
    devs = grid.mesh.devices.reshape(-1)
    if spec.nprocx > 1 or spec.nprocy == 1:
        return Mesh(devs, ("x",)), P(None, "x")
    return Mesh(devs, ("y",)), P("y", None)


def run_fused(grid, arrs, step_fn=None, K=1, tile_rows=None):
    """Drive the fused-exchange sweep under a 1D mesh (interpret)."""
    spec = grid.halo_spec
    sweep = make_stencil_sweep(
        step_fn or (lambda s, p, c: s),
        ly=spec.local_ny, lx=spec.local_nx,
        state_dtypes=tuple(a.dtype for a in arrs),
        steps_per_sweep=K, reach=2, interpret=True, tile_rows=tile_rows,
        exchange_spec=spec, exchange_logical_ids=True)
    mesh, pspec = mesh_1d(grid)
    specs = (pspec,) * len(arrs)
    put = [jax.device_put(np.asarray(a), NamedSharding(mesh, pspec))
           for a in arrs]
    fn = jax.jit(jax.shard_map(lambda *b: sweep(*b), mesh=mesh,
                               in_specs=specs, out_specs=specs,
                               check_vma=False))
    return [np.asarray(o) for o in fn(*put)]


@pytest.mark.parametrize("split", ["x", "y"])
@pytest.mark.parametrize("wrap", [False, True])
def test_identity_step_equals_ppermute_exchange(split, wrap):
    """With an identity step the sweep output IS the exchanged input:
    the in-kernel exchange must match the ppermute path exactly."""
    nx, ny = (4, 1) if split == "x" else (1, 4)
    grid = make_grid(32, 32, nx, ny, wrap_x=wrap and nx > 1,
                     wrap_y=wrap and ny > 1)
    arrs = unique_fields(grid)
    want = [np.asarray(exchange(a, grid.mesh, grid.halo_spec, depth=8))
            for a in arrs]
    got = run_fused(grid, arrs)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_identity_step_overlapped_schedule():
    """y-split with >= 3 tiles: interior tiles stream under the
    in-flight y rows; boundary tiles run after the wait."""
    grid = make_grid(48, 256, 1, 2)
    spec = grid.halo_spec
    assert spec.local_ny == 144
    arrs = unique_fields(grid)
    want = [np.asarray(exchange(a, grid.mesh, grid.halo_spec, depth=8))
            for a in arrs]
    got = run_fused(grid, arrs, tile_rows=48)   # 3 tiles -> overlap on
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.parametrize("tile_rows", [64, 56])
def test_identity_step_clamped_last_tile(tile_rows):
    """TY that does NOT divide the block (r5 chooser): the last tile
    clamps and re-runs its overlap rows — results must be identical,
    both with the overlap schedule off (3 tiles at TY=64: 144 = 2*64 +
    16-row clamp) and on (TY=56)."""
    grid = make_grid(48, 256, 1, 2)
    spec = grid.halo_spec
    assert spec.local_ny == 144 and spec.local_ny % tile_rows != 0
    arrs = unique_fields(grid)
    want = [np.asarray(exchange(a, grid.mesh, grid.halo_spec, depth=8))
            for a in arrs]
    got = run_fused(grid, arrs, tile_rows=tile_rows)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_physics_clamped_last_tile_matches_divider_tiles():
    """Real physics with a clamped last tile equals divider tiling
    bit-for-bit (same window math, overlap rows recomputed to the same
    values)."""
    from dl_esm_inf_tpu.models import nemolite2d as nl
    from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta

    def run(tile_rows):
        m = nl.build(48, 144, ndomains=1, halo_width=8, open_north=True,
                     pallas=True, steps_per_sweep=2)
        m.enable_pallas(interpret=True, steps_per_sweep=2,
                        tile_rows=tile_rows)
        m.set_initial_ssh(gaussian_eta(48, 144, amp=0.2))
        m.run(4)
        return m.gather()

    a = run(80)      # divider: 2 x 80 rows over the 160-row block
    b = run(64)      # clamped: 3 x 64, last tile re-runs 32 rows
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_self_loopback_wrap():
    """1x1 doubly-periodic: every send wraps to the device itself —
    the full exchange machinery (fences aside) with no second device."""
    grid = make_grid(32, 32, 1, 1, wrap_x=True, wrap_y=True)
    arrs = unique_fields(grid, n=1)
    want = [np.asarray(exchange(a, grid.mesh, grid.halo_spec, depth=8))
            for a in arrs]
    got = run_fused(grid, arrs)
    np.testing.assert_array_equal(got[0], want[0])


@pytest.mark.parametrize("split,K", [("x", 2), ("y", 2), ("y", 4)])
def test_nemolite2d_physics_fused_vs_ppermute(split, K):
    """Real flagship physics through the fused transport equals the
    ppermute-transport model at every internal point over several
    temporal-blocked sweeps."""
    from dl_esm_inf_tpu.models import nemolite2d as nl
    from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta
    from dl_esm_inf_tpu.ops.pallas_step import make_fused_step

    gnx, gny = 48, 64
    nx, ny = (4, 1) if split == "x" else (1, 4)
    nsweeps = 3
    nsteps = nsweeps * K

    def build_model():
        grid = dl.Grid(dl.ARAKAWA_C,
                       (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                       dl.OFFSET_NE)
        grid.decompose(gnx, gny, ndomainx=nx, ndomainy=ny, halo_width=8,
                       align=128, align_y=8)
        dl.grid_init(grid, 1000.0, 1000.0, nl.default_tmask(gnx, gny))
        return nl.NemoLite2D(grid)

    # reference: ppermute-transport model (2D mesh is fine — no DMA)
    ma = build_model()
    ma.enable_pallas(interpret=True, steps_per_sweep=K)
    ma.set_initial_ssh(gaussian_eta(gnx, gny, amp=0.2))
    ma.run(nsteps)
    want = ma.gather()

    # fused transport, driven per-axis under a 1D mesh
    mb = build_model()
    mb.set_initial_ssh(gaussian_eta(gnx, gny, amp=0.2))
    spec = mb.grid.halo_spec
    fused = make_fused_step(
        spec.local_ny, spec.local_nx, str(mb.grid.dtype), mb.p,
        mb.grid.dx, mb.grid.dy, mb._fcor, mb.depth,
        interpret=True, steps_per_sweep=K,
        exchange_spec=spec, exchange_logical_ids=True)
    mesh, pspec = mesh_1d(mb.grid)
    tm = jax.device_put(np.asarray(mb._mask_codes),
                        NamedSharding(mesh, pspec))
    state = [jax.device_put(np.asarray(x), NamedSharding(mesh, pspec))
             for x in (mb.sshn_t.data, mb.un.data, mb.vn.data)]
    dtype = jnp.dtype(str(mb.grid.dtype))

    def body(istep0, s_, u_, v_, tm_):
        # forcing computed IN-graph from the traced step index, exactly
        # as the model's _block_sweep does — the eagerly-computed sin
        # differs from the jitted one by an ulp at some arguments
        # (measured), which an exactness test would see
        rtimes = (istep0 + 1 + jnp.arange(K)).astype(dtype) * mb.p.rdt
        return fused(s_, u_, v_, tm_, nl.tidal_forcing(rtimes, mb.p))

    fn = jax.jit(jax.shard_map(body, mesh=mesh,
                               in_specs=(P(),) + (pspec,) * 4,
                               out_specs=(pspec,) * 3,
                               check_vma=False))
    for s in range(nsweeps):
        state = list(fn(jnp.int32(s * K), *state, tm))
    # internal-point comparison via the model's gather
    for fld, out, name in zip((mb.sshn_t, mb.un, mb.vn), state,
                              ("sshn", "un", "vn")):
        fld.data = jax.device_put(np.asarray(out), mb.grid.sharding)
        np.testing.assert_array_equal(fld.gather_inner_data(), want[name],
                                      err_msg=name)


def test_model_transport_wiring_single_device():
    """transport='fused' through the model API: on a 1-device
    non-periodic mesh the exchange compiles away and results equal the
    ppermute transport exactly."""
    from dl_esm_inf_tpu.models import nemolite2d as nl
    from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta

    def build(transport):
        m = nl.build(48, 32, ndomains=1, halo_width=8, open_north=True,
                     pallas=True, steps_per_sweep=2)
        m.enable_pallas(interpret=True, steps_per_sweep=2,
                        transport=transport)
        m.set_initial_ssh(gaussian_eta(48, 32, amp=0.3))
        return m

    ma, mb = build("ppermute"), build("fused")
    assert mb._transport == "fused"
    ma.run(6)
    mb.run(6)
    for k in ("sshn", "un", "vn"):
        np.testing.assert_array_equal(mb.gather()[k], ma.gather()[k],
                                      err_msg=k)


def test_fused_exchange_guards():
    spec_bad = dl.Grid(dl.ARAKAWA_C,
                       (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                       dl.OFFSET_NE)
    spec_bad.decompose(32, 32, ndomainx=2, ndomainy=2, halo_width=4,
                       align_y=8)
    with pytest.raises(ValueError, match="8-row-aligned"):
        make_stencil_sweep(lambda s, p, c: s, ly=spec_bad.ny,
                           lx=spec_bad.nx, state_dtypes=(jnp.float32,),
                           interpret=True,
                           exchange_spec=spec_bad.halo_spec)
    grid = make_grid(32, 32, 2, 2)
    with pytest.raises(ValueError, match="uniform state"):
        make_stencil_sweep(lambda s, p, c: s, ly=grid.ny, lx=grid.nx,
                           state_dtypes=(jnp.float32, jnp.int32),
                           interpret=True,
                           exchange_spec=grid.halo_spec)
