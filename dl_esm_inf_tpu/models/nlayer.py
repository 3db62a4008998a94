"""N-layer linear stacked shallow-water model (multi-level client).

Fifth client family: the two-layer demonstrator generalised to an
arbitrary number of stacked fluid layers, built on MULTI-LEVEL fields
(``Field(levels=N)``) — the whole layer stack lives in three 3D arrays
whose level axis rides through one halo exchange per step, something
the reference cannot express at all (its 3D-real exchange aborts,
parallel_comms_mod.f90:1738-1742).

Linearised layered equations (flat bottom, f=0, forward-backward),
``eta[k]`` the displacement of the interface ABOVE layer k (eta[0] is
the free surface), ``H[k]`` the rest thicknesses, reduced gravities
``gp[k]`` across each interior interface:

    P[k]      = g*eta[0] + sum_{j=1..k} gp[j]*eta[j]   (cumsum over k)
    du[k]/dt  = -dP[k]/dx,   dv[k]/dt = -dP[k]/dy      (on U/V faces)
    deta[k]/dt = -sum_{j=k..N-1} H[j]*div(u[j])        (reverse cumsum)

The level couplings are cumulative sums along the (unsharded) level
axis — pure per-chip compute; the horizontal stencils are the same
reach-1 C-grid operators as every other client.  For N=2 this reduces
exactly to models/twolayer.py (pinned by test).

The fused Pallas path unrolls the (static) layer count onto the sweep
engine's n-field state: 3N two-dimensional windows per tile, the level
couplings as per-layer Python-loop accumulations traced into the kernel
— so even the multi-level client runs at one HBM pass per K steps.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

import dl_esm_inf_tpu as dl
from ..core import layout
from ..ops import stencils as st
from ..parallel.halo import exchange_multi_fn
from .gravity_wave import default_tmask, gaussian_eta  # noqa: F401


class NLayerModel:
    """eta/u/v as (layers, ny, nx) multi-level fields."""

    def __init__(self, grid: dl.Grid, dt: float, layers: int = 3,
                 g: float = 9.81, gp=0.02, thickness=None):
        if layers < 1:
            raise ValueError(f"layers must be >= 1, got {layers}")
        self.grid = grid
        self.layers = int(layers)
        self.dt, self.g = float(dt), float(g)
        gp = np.broadcast_to(np.asarray(gp, np.float64),
                             (max(layers - 1, 1),)).copy()
        #: pressure weights per interface: g above layer 0, reduced
        #: gravities across the interior interfaces
        self._pw = np.concatenate(([g], gp[: layers - 1]))
        if thickness is None:
            thickness = np.full(layers, 100.0 / layers)
        self._H = np.broadcast_to(np.asarray(thickness, np.float64),
                                  (layers,)).copy()
        if np.any(self._H <= 0):
            raise ValueError("layer thicknesses must be positive")

        self.eta = dl.Field(grid, dl.T_POINTS, levels=layers)
        self.u = dl.Field(grid, dl.U_POINTS, levels=layers)
        self.v = dl.Field(grid, dl.V_POINTS, levels=layers)

        dtype = self.eta.dtype
        tm = grid.tmask
        wet_t = (tm == 1)
        d = grid.decomp
        gx = layout.global_x_index(d)
        gy = layout.global_y_index(d)
        geo = jnp.asarray(((gy >= 0) & (gy < d.global_ny))[:, None]
                          & ((gx >= 0) & (gx < d.global_nx))[None, :])
        self._t_upd = (wet_t & geo).astype(dtype)
        self._u_wet = (wet_t & (st.xp(tm) == 1)).astype(dtype)
        self._v_wet = (wet_t & (st.yp(tm) == 1)).astype(dtype)
        self._mask_codes = jax.device_put(
            st.pack_mask_bits((self._t_upd, self._u_wet, self._v_wet)),
            grid.sharding)
        self._step_cache = {}
        self.use_pallas = False
        self._pallas_interpret = False
        self._pallas_tile_rows = None
        self._sweep_K = 1

    # ------------------------------------------------------------------
    def set_initial(self, eta_global=None) -> None:
        """``eta_global``: (layers, gny, gnx) interface displacements."""
        if eta_global is None:
            return
        g = np.asarray(eta_global)
        d = self.grid.decomp
        want = (self.layers, d.global_ny, d.global_nx)
        if g.shape != want:
            raise ValueError(
                f"set_initial expects eta of shape {want}, got {g.shape}")
        stacked = np.stack([
            layout.stack_global(self.grid.decomp, g[k], mode="zeros",
                                dtype=np.dtype(self.eta.dtype))
            for k in range(self.layers)])
        self.eta.set_data(stacked)
        self.eta.halo_exchange(1)

    # ------------------------------------------------------------------
    def _step_math(self, eta, u, v, t_upd, u_wet, v_wet):
        """One forward-backward step on (..., layers, ly, lx) blocks —
        leading-dim agnostic (the level axis is -3), so an ensemble
        member axis broadcasts through unchanged."""
        dt = self.dt
        dx, dy = self.grid.dx, self.grid.dy
        pw = jnp.asarray(self._pw, eta.dtype)[:, None, None]
        H = jnp.asarray(self._H, eta.dtype)[:, None, None]
        # layer pressures: cumulative sum down the stack
        p = jnp.cumsum(pw * eta, axis=-3)
        un = (u - dt * st.ddx(p, dx)) * u_wet
        vn = (v - dt * st.ddy(p, dy)) * v_wet
        div = st.ddx_back(un, dx) + st.ddy_back(vn, dy)
        # each interface moves with the transport of every layer BELOW
        # it: reverse cumulative sum
        flux = jnp.flip(jnp.cumsum(jnp.flip(H * div, -3), axis=-3), -3)
        etan = jnp.where(t_upd > 0, eta - dt * flux, eta)
        return etan, un, vn

    def _block_step(self, exch, eta, u, v, t_upd, u_wet, v_wet):
        """One step on local blocks (the ensemble adapter's protocol)."""
        eta, u, v = exch((eta, u, v))
        return self._step_math(eta, u, v, t_upd, u_wet, v_wet)

    def _layer_step(self, etas, us, vs, t_upd, u_wet, v_wet):
        """The same step as per-layer 2D arrays (the sweep kernel's
        form: a static Python unroll over layers, no level axis)."""
        dt = self.dt
        dx, dy = self.grid.dx, self.grid.dy
        L = self.layers
        pk = None
        new_us, new_vs, divs = [], [], []
        for k in range(L):
            contrib = float(self._pw[k]) * etas[k]
            pk = contrib if pk is None else pk + contrib
            un = (us[k] - dt * st.ddx(pk, dx)) * u_wet
            vn = (vs[k] - dt * st.ddy(pk, dy)) * v_wet
            new_us.append(un)
            new_vs.append(vn)
            divs.append(st.ddx_back(un, dx) + st.ddy_back(vn, dy))
        acc = None
        new_etas = [None] * L
        for k in range(L - 1, -1, -1):
            contrib = float(self._H[k]) * divs[k]
            acc = contrib if acc is None else acc + contrib
            new_etas[k] = jnp.where(t_upd > 0, etas[k] - dt * acc,
                                    etas[k])
        return tuple(new_etas) + tuple(new_us) + tuple(new_vs)

    # ------------------------------------------------------------------
    def enable_pallas(self, interpret: bool = False,
                      tile_rows: int | None = None,
                      steps_per_sweep: int = 1) -> None:
        """Fused 3N-field stencil sweep (ops/sweep.py; reach 1, K<=8):
        the static layer count unrolls onto the engine's n-field
        state."""
        from ..ops.fastpath import enable_fast_path
        enable_fast_path(self, reach=1, interpret=interpret,
                         tile_rows=tile_rows,
                         steps_per_sweep=steps_per_sweep)

    def set_steps_per_exchange(self, steps_per_sweep: int) -> None:
        """Comm avoidance on the jnp path: K chained steps per depth-K
        exchange (no Pallas; ops/fastpath.py)."""
        from ..ops.fastpath import set_steps_per_exchange
        set_steps_per_exchange(self, reach=1,
                               steps_per_sweep=steps_per_sweep)

    def _make_sweep(self, K: int):
        from ..ops.sweep import make_stencil_sweep
        spec = self.grid.halo_spec
        dtype = jnp.dtype(self.eta.dtype)
        L = self.layers

        def prepare(aux):
            return st.unpack_mask_bits(aux[0], 3, dtype)

        def stepf(state, prepared, scalars):
            return self._layer_step(state[:L], state[L:2 * L],
                                    state[2 * L:], *prepared)

        return make_stencil_sweep(
            stepf, ly=spec.local_ny, lx=spec.local_nx,
            state_dtypes=(dtype,) * (3 * L), aux_dtypes=(jnp.int8,),
            n_scalars=0, steps_per_sweep=K, reach=1, prepare_fn=prepare,
            tile_rows=self._pallas_tile_rows,
            interpret=self._pallas_interpret,
            repx=spec.repx, repy=spec.repy)

    # ------------------------------------------------------------------
    def step_program(self, nsteps: int):
        if nsteps not in self._step_cache:
            grid = self.grid
            L = self.layers
            exch = exchange_multi_fn(grid.halo_spec, depth=1)
            if self.use_pallas or self._sweep_K > 1:
                exchK = exchange_multi_fn(grid.halo_spec,
                                          depth=max(self._sweep_K, 1))
            if self.use_pallas:
                sweepK = self._make_sweep(self._sweep_K)

            def body(eta, u, v, t_upd, u_wet, v_wet, codes):
                state = (eta, u, v)
                base = 0
                K = self._sweep_K
                if (self.use_pallas or K > 1) and nsteps >= K:
                    if self.use_pallas:
                        # flatten the level axis ONCE around the loop,
                        # not per sweep: the exchange is layout-
                        # agnostic, so the 3L 2D planes ride it directly
                        flat0 = tuple([state[0][k] for k in range(L)]
                                      + [state[1][k] for k in range(L)]
                                      + [state[2][k] for k in range(L)])

                        def sweep(_, s):
                            return tuple(sweepK(*exchK(s), codes))

                        flat = lax.fori_loop(0, nsteps // K, sweep,
                                             flat0)
                        state = (jnp.stack(flat[:L]),
                                 jnp.stack(flat[L:2 * L]),
                                 jnp.stack(flat[2 * L:]))
                    else:
                        def sweep(_, s):   # jnp comm avoidance
                            s = exchK(s)
                            for _k in range(K):
                                s = self._step_math(*s, t_upd, u_wet,
                                                    v_wet)
                            return tuple(s)

                        state = lax.fori_loop(0, nsteps // K, sweep,
                                              state)
                    base = (nsteps // K) * K
                if nsteps - base:
                    def one(i, s):
                        s = exch(s)
                        return self._step_math(*s, t_upd, u_wet, v_wet)
                    state = lax.fori_loop(0, nsteps - base, one, state)
                return state

            blk3 = P(None, "y", "x")
            blk2 = P("y", "x")
            smapped = jax.shard_map(
                body, mesh=grid.mesh,
                in_specs=(blk3,) * 3 + (blk2,) * 3 + (blk2,),
                out_specs=(blk3,) * 3, check_vma=False)
            self._step_cache[nsteps] = jax.jit(smapped)
        return self._step_cache[nsteps]

    def run(self, nsteps: int) -> None:
        prog = self.step_program(nsteps)
        out = prog(self.eta.data, self.u.data, self.v.data,
                   self._t_upd, self._u_wet, self._v_wet,
                   self._mask_codes)
        self.eta.data, self.u.data, self.v.data = out

    # ------------------------------------------------------------------
    def gather(self) -> dict:
        return {"eta": self.eta.gather_inner_data(),
                "u": self.u.gather_inner_data(),
                "v": self.v.gather_inner_data()}

    def checksums(self) -> dict:
        return {"eta": self.eta.checksum(), "u": self.u.checksum(),
                "v": self.v.checksum()}


def build(gnx: int = 64, gny: int = 64, ndomains=None, dt: float = 0.02,
          layers: int = 3, tmask=None, halo_width: int = 1,
          pallas: bool = False, steps_per_sweep: int = 1,
          **kw) -> NLayerModel:
    from ..ops.fastpath import fast_path_grid_args
    halo_width, align, align_y = fast_path_grid_args(
        pallas, steps_per_sweep, 1, halo_width)
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(gnx, gny, ndomains=ndomains, halo_width=halo_width,
                   align=align, align_y=align_y)
    dl.grid_init(grid, 1.0, 1.0, default_tmask(gnx, gny)
                 if tmask is None else tmask)
    model = NLayerModel(grid, dt=dt, layers=layers, **kw)
    if pallas:
        model.enable_pallas(steps_per_sweep=steps_per_sweep)
    elif steps_per_sweep > 1:
        # jnp comm avoidance (a silent no-op here would reintroduce the
        # bug nemolite2d.build once had)
        model.set_steps_per_exchange(steps_per_sweep)
    return model


def golden_reference(eta0, tmask, dx, dy, dt, nsteps, g: float = 9.81,
                     gp=0.02, thickness=None) -> dict:
    """Independent NumPy transcription: explicit per-layer Python loops
    (no cumsum, no level vectorisation) over explicit rolls — a
    different formulation from the model's level-axis cumulative sums."""
    eta0 = np.asarray(eta0, np.float64)
    layers = eta0.shape[0]
    pw = np.concatenate(([g], np.broadcast_to(
        np.asarray(gp, np.float64), (max(layers - 1, 1),))[: layers - 1]))
    H = (np.full(layers, 100.0 / layers) if thickness is None
         else np.broadcast_to(np.asarray(thickness, np.float64),
                              (layers,)))
    wet_t = (tmask == 1).astype(np.float64)
    u_wet = wet_t * np.roll(wet_t, -1, axis=1)
    v_wet = wet_t * np.roll(wet_t, -1, axis=0)
    e = eta0.copy()
    u = np.zeros_like(e)
    v = np.zeros_like(e)
    xp = lambda a: np.roll(a, -1, axis=1)
    xm = lambda a: np.roll(a, 1, axis=1)
    yp = lambda a: np.roll(a, -1, axis=0)
    ym = lambda a: np.roll(a, 1, axis=0)
    for _ in range(nsteps):
        pk = np.zeros_like(e[0])
        divs = []
        for k in range(layers):
            pk = pk + pw[k] * e[k]
            u[k] = (u[k] - dt * (xp(pk) - pk) / dx) * u_wet
            v[k] = (v[k] - dt * (yp(pk) - pk) / dy) * v_wet
            divs.append((u[k] - xm(u[k])) / dx + (v[k] - ym(v[k])) / dy)
        acc = np.zeros_like(e[0])
        for k in range(layers - 1, -1, -1):
            acc = acc + H[k] * divs[k]
            e[k] = np.where(wet_t > 0, e[k] - dt * acc, e[k])
    return {"eta": e, "u": u, "v": v}
