#!/usr/bin/env python
"""Reference functional oracles on the REAL chip (BASELINE.md row
'functional parity ... and on TPU').

Single-chip versions of the reference test programs (SURVEY §4): the
checksum oracle (test_gsum), the scatter/gather round trip
(test_reduction), device sub-region sync (test_device_io) and the
example model — run on the default (TPU) backend at its native f32.
The multi-device halo oracles run in the pytest suite on the forced
CPU mesh; on a real slice this script runs unchanged per host.

Exit code 0 = all oracles pass.
"""
import numpy as np

import dl_esm_inf_tpu as dl


def main():
    import jax
    from dl_esm_inf_tpu.utils import compilation_cache
    compilation_cache.enable()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    gnx, gny = 40, 30
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomains=1)
    dl.grid_init(grid, 1.0, 1.0)

    # --- checksum oracle (test_gsum.f90): internal=1 -> sum == nx*ny --
    for pts in (dl.U_POINTS, dl.V_POINTS, dl.T_POINTS, dl.F_POINTS):
        fld = dl.Field(grid, pts, init_global_data=np.ones((gny, gnx)))
        cs = dl.field_checksum(fld)
        assert abs(cs - gnx * gny) < 1e-3, (pts, cs)
    print("checksum oracle        OK (U/V/T/F == %d)" % (gnx * gny))

    # --- scatter/gather round trip (test_reduction.f90) ---------------
    vals = (np.arange(gnx * gny, dtype=np.float64)
            .reshape(gny, gnx))
    fld = dl.Field(grid, dl.T_POINTS, init_global_data=vals)
    fld.data = fld.data + 1.0
    got = fld.gather_inner_data()
    np.testing.assert_allclose(got, vals + 1.0, rtol=1e-6)
    print("scatter/gather oracle  OK (unique values + 1)")

    # --- device sub-region sync (test_device_io.f90) ------------------
    fld2 = dl.Field(grid, dl.T_POINTS)
    fld2.write_to_device(dl.Region(2, 7, 2, 7), np.ones((5, 5)))
    quad = fld2.read_from_device(dl.Region(5, 9, 5, 9))
    want = np.zeros((4, 4))
    want[:2, :2] = 1.0
    np.testing.assert_allclose(np.asarray(quad), want)
    print("device-sync oracle     OK (mixed written/zero quadrant)")

    # --- the reference example model ----------------------------------
    from dl_esm_inf_tpu.models import example_model
    sums = example_model.run(4, 10)
    assert all(abs(v - 40.0) < 1e-3 for v in sums.values()), sums
    print("example-model oracle   OK (4 checksums == 40)")

    # --- multi-level fields + kernel schedule (compiled) --------------
    from dl_esm_inf_tpu.api.kernel_meta import (GO_READ, GO_READWRITE,
                                                GO_WRITE, GO_CT,
                                                Schedule, go_arg,
                                                go_stencil, invoke,
                                                kernel)
    from dl_esm_inf_tpu.ops import stencils as st

    g3 = np.stack([vals + 1000.0 * k for k in range(3)])
    f3 = dl.Field(grid, dl.T_POINTS, init_global_data=g3, levels=3)
    f3.halo_exchange(1)
    got3 = f3.gather_inner_data()
    np.testing.assert_allclose(got3, g3, rtol=1e-6)
    print("multi-level oracle     OK (3-level exchange + gather)")

    @kernel(args=[go_arg(GO_WRITE, GO_CT),
                  go_arg(GO_READ, GO_CT, go_stencil(0, 11, 0))])
    def east(out, x):
        return st.xp(x)

    fa = dl.Field(grid, dl.T_POINTS, init_global_data=vals)
    fb = dl.Field(grid, dl.T_POINTS)
    fc = dl.Field(grid, dl.T_POINTS)
    invoke(east, fb, fa)
    invoke(east, fc, fb)
    want_c = fc.gather_inner_data()
    fb2 = dl.Field(grid, dl.T_POINTS)
    fc2 = dl.Field(grid, dl.T_POINTS)
    Schedule((east, fb2, fa), (east, fc2, fb2))()
    np.testing.assert_allclose(fc2.gather_inner_data(), want_c, rtol=1e-6)
    print("schedule oracle        OK (2-kernel chain == eager invokes)")

    # --- COMPILED remote-DMA transports, self-loopback ----------------
    # A 1x1 doubly-periodic mesh makes every remote DMA a send-to-self:
    # the only way to execute the compiled (non-interpret) Mosaic
    # exchange kernels — fences, strip DMAs, corner sequencing — on a
    # single real chip.  Values must equal the ppermute exchange.
    if jax.default_backend() == "tpu":
        import jax.numpy as jnp
        from dl_esm_inf_tpu.parallel.halo import exchange
        from dl_esm_inf_tpu.parallel.halo_pallas import exchange_pallas
        from dl_esm_inf_tpu.ops.sweep import make_stencil_sweep
        from jax.sharding import PartitionSpec as P

        wgrid = dl.Grid(dl.ARAKAWA_C,
                        (dl.BC_PERIODIC, dl.BC_PERIODIC, dl.BC_NONE),
                        dl.OFFSET_NE)
        wgrid.decompose(40, 40, ndomains=1, halo_width=8, align=128,
                        align_y=8)
        dl.grid_init(wgrid, 1.0, 1.0)
        spec = wgrid.halo_spec
        a = jax.device_put(
            jnp.arange(np.prod(wgrid.array_shape),
                       dtype=jnp.float32).reshape(wgrid.array_shape),
            wgrid.sharding)
        want = np.asarray(exchange(a, wgrid.mesh, spec, depth=8))
        got = np.asarray(exchange_pallas(a, wgrid.mesh, spec, depth=8))
        np.testing.assert_array_equal(got, want)
        print("remote-DMA exchange    OK (compiled, self-loopback wrap)")

        # depth 1: NON-8-aligned strip offsets — Mosaic accepts static
        # remote-copy offsets at any row (measured; the 8-row rule is
        # for the sweep's dynamic window DMAs), pin that it stays true
        want1 = np.asarray(exchange(a, wgrid.mesh, spec, depth=1))
        got1 = np.asarray(exchange_pallas(a, wgrid.mesh, spec, depth=1))
        np.testing.assert_array_equal(got1, want1)
        print("remote-DMA depth-1     OK (compiled, unaligned offsets)")

        # multi-level (3D): the level axis rides every strip DMA whole
        # — the exchange the reference aborts on
        # (parallel_comms_mod.f90:1736-1742), compiled on the chip
        from jax.sharding import NamedSharding
        a3 = jax.device_put(
            jnp.arange(3 * np.prod(wgrid.array_shape),
                       dtype=jnp.float32).reshape(
                           (3,) + wgrid.array_shape),
            NamedSharding(wgrid.mesh, P(None, "y", "x")))
        want3 = np.asarray(exchange(a3, wgrid.mesh, spec, depth=8))
        got3d = np.asarray(exchange_pallas(a3, wgrid.mesh, spec, depth=8))
        np.testing.assert_array_equal(got3d, want3)
        print("remote-DMA 3-level     OK (compiled, level axis on DMA)")

        sweep = make_stencil_sweep(
            lambda s, p, c: s, ly=spec.local_ny, lx=spec.local_nx,
            state_dtypes=(jnp.float32,), exchange_spec=spec)
        fn = jax.jit(jax.shard_map(lambda b: sweep(b), mesh=wgrid.mesh,
                                   in_specs=P("y", "x"),
                                   out_specs=(P("y", "x"),),
                                   check_vma=False))
        got2 = np.asarray(fn(a)[0])
        np.testing.assert_array_equal(got2, want)
        print("fused-transport sweep  OK (compiled, self-loopback wrap)")

        # --- fused SCHEDULE (whole kernel sequence as one Mosaic
        # kernel) compiled against its jnp form ------------------------
        def fgrid():
            g = dl.Grid(dl.ARAKAWA_C,
                        (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                        dl.OFFSET_NE)
            g.decompose(64, 64, ndomains=1, halo_width=4, align=128,
                        align_y=8)
            dl.grid_init(g, 1.0, 1.0)
            v = np.arange(64.0 * 64).reshape(64, 64)
            return (dl.Field(g, dl.T_POINTS, init_global_data=v),
                    dl.Field(g, dl.T_POINTS), dl.Field(g, dl.T_POINTS))

        @kernel(args=[go_arg(GO_WRITE, GO_CT),
                      go_arg(GO_READ, GO_CT, go_stencil(0, 11, 0))])
        def east_k(out, x):
            return st.xp(x)

        @kernel(args=[go_arg(GO_WRITE, GO_CT), go_arg(GO_READ, GO_CT)])
        def dbl(out, x):
            return 2.0 * x

        fa1, fb1, fc1 = fgrid()
        fa2, fb2, fc2 = fgrid()
        Schedule((east_k, fb1, fa1), (dbl, fc1, fb1),
                 (east_k, fc1, fc1))()
        Schedule((east_k, fb2, fa2), (dbl, fc2, fb2),
                 (east_k, fc2, fc2)).fused()           # COMPILED
        np.testing.assert_allclose(fc2.gather_inner_data(),
                                   fc1.gather_inner_data(), rtol=1e-6)
        print("fused schedule         OK (compiled == jnp schedule)")

        # --- MULTI-LEVEL fused schedule COMPILED (levels stream as 2D
        # planes; the kernel body sees the stacked (N, ty, tx) view and
        # couples levels via a cumsum down the stack) — the r4 nlayer
        # one-dispatch tier on real Mosaic, not just interpret mode ----
        @kernel(args=[go_arg(GO_READWRITE, GO_CT, go_stencil(0, 11, 0))])
        def k3lev(e):
            # inter-level coupling: partial sums down the stack as
            # explicit adds (Mosaic has no cumsum lowering — measured)
            p1 = e[0]
            p2 = p1 + e[1]
            pres = jnp.stack([p1, p2, p2 + e[2]])
            return e + 0.25 * (st.xp(pres) - pres)

        @kernel(args=[go_arg(GO_WRITE, GO_CT), go_arg(GO_READ, GO_CT)])
        def vsum(out, x):
            return x[0] + x[1] + x[2]          # (3, h, w) -> (h, w)

        def mlgrid():
            g = dl.Grid(dl.ARAKAWA_C,
                        (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                        dl.OFFSET_NE)
            g.decompose(64, 64, ndomains=1, halo_width=4, align=128,
                        align_y=8)
            dl.grid_init(g, 1.0, 1.0)
            v3 = 0.01 * np.arange(3.0 * 64 * 64).reshape(3, 64, 64)
            return (dl.Field(g, dl.T_POINTS, init_global_data=v3,
                             levels=3),
                    dl.Field(g, dl.T_POINTS))
        me1, mc1 = mlgrid()
        me2, mc2 = mlgrid()
        calls = lambda e, c: ((k3lev, e), (k3lev, e), (vsum, c, e))
        Schedule(*calls(me1, mc1))()
        Schedule(*calls(me2, mc2)).fused()             # COMPILED
        np.testing.assert_allclose(me2.gather_inner_data(),
                                   me1.gather_inner_data(), rtol=1e-6)
        np.testing.assert_allclose(mc2.gather_inner_data(),
                                   mc1.gather_inner_data(), rtol=1e-6)
        print("fused 3-level sched    OK (compiled, mixed 3D/2D slots)")

        # --- PSy-style flagship: 13 metadata kernels as ONE compiled
        # Mosaic kernel, vs the production model -----------------------
        from dl_esm_inf_tpu.models import nemolite2d as nl2
        from dl_esm_inf_tpu.models.nemolite2d_psy import NemoLite2DPsy
        from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta

        prod = nl2.build(64, 48, ndomains=1)
        prod.set_initial_ssh(gaussian_eta(64, 48, amp=0.2))
        prod.run(10)
        want_p = prod.gather()
        psy = NemoLite2DPsy(64, 48, ndomains=1, align=128)
        psy.set_initial_ssh(gaussian_eta(64, 48, amp=0.2))
        psy.run(10, fused=True)                        # COMPILED
        got_p = psy.gather()
        for k2 in ("sshn", "un", "vn"):
            np.testing.assert_allclose(got_p[k2], want_p[k2],
                                       rtol=2e-5, atol=1e-6)
        print("PSy fused flagship     OK (compiled metadata step == "
              "production)")

        # --- tracer transport: COMPILED fused sweep at both stencil
        # reaches vs the jnp path, plus exact conservation on chip ------
        from dl_esm_inf_tpu.models import tracer as tc
        tcu, tcv = tc.streamfunction_velocities(
            0.4 * gaussian_eta(64, 48, amp=1.0, width=0.2))
        cb = gaussian_eta(64, 48, amp=1.0) + 0.01
        for scheme, K in (("upwind", 4), ("vanleer", 2)):
            tj = tc.build(64, 48, ndomains=1, dt=0.2, u=tcu, v=tcv,
                          kappa=0.02, scheme=scheme)
            tj.set_initial_tracer(cb)
            tj.run(8)
            tp = tc.build(64, 48, ndomains=1, dt=0.2, u=tcu, v=tcv,
                          kappa=0.02, scheme=scheme, pallas=True,
                          steps_per_sweep=K)                # COMPILED
            tp.set_initial_tracer(cb)
            m0 = tp.mass()
            tp.run(8)
            np.testing.assert_allclose(tp.gather()["c"],
                                       tj.gather()["c"],
                                       rtol=2e-5, atol=1e-6)
            assert abs(tp.mass() - m0) <= 1e-4 * abs(m0)
        print("tracer sweep oracle    OK (compiled reach-1/2 == jnp; "
              "mass conserved)")

        # --- grid nesting: the r=1 seam is bitwise on hardware, and a
        # two-way telescope cascade runs as one program ------------------
        from dl_esm_inf_tpu.models import gravity_wave as gwm
        from dl_esm_inf_tpu.models.nesting import NestSet, OneWayNest
        solo = gwm.build(64, 64, ndomains=1, dt=0.02, depth=10.0)
        solo.set_initial_eta(gaussian_eta(64, 64, width=0.08))
        solo.run(20)
        par = gwm.build(64, 64, ndomains=1, dt=0.02, depth=10.0)
        par.set_initial_eta(gaussian_eta(64, 64, width=0.08))
        nst = OneWayNest(par, origin=(16, 16), shape=(32, 32), ratio=1,
                         two_way=True)
        nst.sync_from_parent()
        nst.run(20)
        assert np.array_equal(par.eta.gather_inner_data(),
                              solo.eta.gather_inner_data())
        assert np.array_equal(
            nst.child.eta.gather_inner_data()[2:-2, 2:-2],
            solo.eta.gather_inner_data()[18:46, 18:46])
        mid = OneWayNest(par, origin=(8, 8), shape=(24, 24), ratio=2)
        mid.sync_from_parent()
        inner = OneWayNest(mid.child, origin=(8, 8), shape=(16, 16),
                           ratio=2, two_way=True)
        inner.sync_from_parent()
        NestSet([nst, mid, inner]).run(10)
        for mdl in (par, nst.child, mid.child, inner.child):
            v = mdl.eta.gather_inner_data()
            assert np.isfinite(v).all() and np.abs(v).max() < 2.0
        print("nesting oracle         OK (r=1 two-way bitwise on chip; "
              "sibling + telescope forest in one program)")
    print("ALL TPU ORACLES PASS")


if __name__ == "__main__":
    main()
