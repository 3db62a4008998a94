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
