"""Physical diagnostics: conserved quantities and stability margins."""
import numpy as np

from dl_esm_inf_tpu.models import gravity_wave as gw
from dl_esm_inf_tpu.utils import diagnostics as dg


def build(ndom=4, gnx=64, gny=48, dt=0.02):
    m = gw.build(gnx, gny, ndomains=ndom, dt=dt, depth=10.0)
    m.set_initial_eta(gw.gaussian_eta(gnx, gny, amp=0.5))
    return m


def test_volume_matches_gather():
    """volume() integrates ALL internal points times the cell area
    (non-unit dx/dy so the scaling is actually exercised)."""
    m = gw.build(64, 48, ndomains=4, dt=0.02, depth=10.0, dx=2.0, dy=3.0)
    m.set_initial_eta(gw.gaussian_eta(64, 48, amp=0.5))
    vol = dg.volume(m.eta, m.grid.dx, m.grid.dy)
    g = m.gather()["eta"]
    assert abs(vol - g.sum() * 2.0 * 3.0) < 1e-9 * max(1.0, abs(vol))


def test_energy_roughly_conserved():
    """Linear SW conserves total energy up to the forward-backward
    time-discretisation error; over a short run the drift is small."""
    m = build(dt=0.01)
    def total():
        return (dg.potential_energy(m.eta, m.g, m.grid.dx, m.grid.dy)
                + dg.kinetic_energy(m.u, m.v, m.depth, m.grid.dx,
                                    m.grid.dy))
    e0 = total()
    m.run(200)
    e1 = total()
    assert e0 > 0
    assert abs(e1 - e0) < 0.05 * e0


def test_flagship_energy_budget_variable_bathymetry():
    """200-step energy budget of the nonlinear flagship over a SLOPING
    bottom (the diagnostic now covers the model's headline feature):
    total energy is positive, bounded, and decays — the model carries
    bottom friction and viscosity, so a closed basin must dissipate."""
    from dl_esm_inf_tpu.models import nemolite2d as nl
    from dl_esm_inf_tpu.models.gravity_wave import gaussian_eta

    gnx, gny = 48, 40
    yy = np.linspace(0.0, 1.0, gny)[:, None]
    depth = 60.0 + 60.0 * yy + 0.0 * np.linspace(0, 1, gnx)[None, :]
    m = nl.build(gnx, gny, ndomains=4, open_north=False, depth=depth)
    m.set_initial_ssh(gaussian_eta(gnx, gny, amp=0.5))

    def total():
        pe = dg.potential_energy(m.sshn_t, m.p.g, m.grid.dx, m.grid.dy)
        ke = dg.kinetic_energy(m.un, m.vn, m.bathymetry, m.grid.dx,
                               m.grid.dy, ssh_u=m.sshn_u, ssh_v=m.sshn_v)
        return float(pe), float(ke)

    pe0, ke0 = total()
    assert pe0 > 0 and ke0 == 0.0          # starts at rest
    m.run(200)
    pe1, ke1 = total()
    e0, e1 = pe0 + ke0, pe1 + ke1
    assert ke1 > 0                         # motion spun up
    assert 0 < e1 < 1.02 * e0              # bounded; no spurious source
    # decomposition invariance of the diagnostic itself
    m1 = nl.build(gnx, gny, ndomains=1, open_north=False, depth=depth)
    m1.set_initial_ssh(gaussian_eta(gnx, gny, amp=0.5))
    m1.run(200)
    ke1_1 = float(dg.kinetic_energy(m1.un, m1.vn, m1.bathymetry,
                                    m1.grid.dx, m1.grid.dy,
                                    ssh_u=m1.sshn_u, ssh_v=m1.sshn_v))
    assert abs(ke1_1 - ke1) < 1e-10 * max(1.0, abs(ke1))


def test_kinetic_energy_scalar_vs_array_depth_agree():
    """A constant depth ARRAY must reproduce the scalar-depth KE."""
    m = build(dt=0.01)
    m.run(30)
    ht = np.full(m.grid.array_shape, float(m.depth))
    ke_s = float(dg.kinetic_energy(m.u, m.v, m.depth, m.grid.dx,
                                   m.grid.dy))
    ke_a = float(dg.kinetic_energy(m.u, m.v, ht, m.grid.dx, m.grid.dy))
    assert abs(ke_s - ke_a) < 1e-9 * max(1.0, abs(ke_s))


def test_cfl_number_sane():
    m = build(dt=0.01)
    m.run(50)
    c = dg.cfl_number(m.u, m.v, m.dt, m.grid.dx, m.grid.dy,
                      g=m.g, depth=m.depth)
    assert 0.0 < c < 1.0       # stable configuration

    # invariance: diagnostics must not depend on the decomposition
    m1 = build(ndom=1, dt=0.01)
    m1.run(50)
    c1 = dg.cfl_number(m1.u, m1.v, m1.dt, m1.grid.dx, m1.grid.dy,
                       g=m1.g, depth=m1.depth)
    assert abs(c - c1) < 1e-12
