"""Linear gravity-wave shallow-water model (BASELINE.json config #2).

The smallest end-to-end client of the framework: grid + staggered fields
+ stencil step + BC masks + time loop (SURVEY §7 M2).  Forward-backward
time stepping on the Arakawa-C grid with NE offset:

    u^{n+1}   = u^n - g dt (eta^n_{i+1} - eta^n_i)/dx          on U faces
    v^{n+1}   = v^n - g dt (eta^n_{j+1} - eta^n_j)/dy          on V faces
    eta^{n+1} = eta^n - H dt [ (u^{n+1}_i - u^{n+1}_{i-1})/dx
                             + (v^{n+1}_j - v^{n+1}_{j-1})/dy ] on T points

Solid walls are expressed purely through the T mask: a face is wet only
if both adjacent T points are wet, so a land ring is a no-slip wall with
no special-case edge code (the reference's tmask philosophy,
grid_mod.f90:94-102).

The whole time step — halo exchange + three stencil updates — is ONE
``shard_map`` program; multiple steps run under ``lax.fori_loop`` inside
a single jit, so XLA fuses each step into a minimal number of HBM passes
and schedules the ppermutes.
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


def default_tmask(gnx: int, gny: int) -> np.ndarray:
    """All-wet domain with a one-cell land ring (solid walls)."""
    t = np.ones((gny, gnx), dtype=np.int32)
    t[0, :] = t[-1, :] = 0
    t[:, 0] = t[:, -1] = 0
    return t


def gaussian_eta(gnx: int, gny: int, amp: float = 1.0,
                 width: float = 0.1) -> np.ndarray:
    """Initial sea-surface bump in the domain centre."""
    x = (np.arange(gnx) - gnx / 2) / gnx
    y = (np.arange(gny) - gny / 2) / gny
    r2 = x[None, :] ** 2 + y[:, None] ** 2
    return amp * np.exp(-r2 / (2 * width ** 2))


def wet_update_masks(grid, dtype):
    """``(t_upd, u_wet, v_wet)`` update masks shared by the explicit
    and semi-implicit models.

    ``t_upd`` is the geometric update mask: wet T cells representing a
    real global cell, INCLUDING in-domain shard-halo cells (not just
    the internal region) — the deep-halo sweep path recomputes halo
    cells locally each sub-step, which requires them to evolve exactly
    like their interior twins on the neighbouring shard.  Face masks:
    a U/V face is wet only if both adjacent T points are
    (grid_mod.f90:94-102's tmask philosophy)."""
    tm = grid.tmask
    wet_t = (tm == 1)
    d = grid.decomp
    gx = layout.global_x_index(d)
    gy = layout.global_y_index(d)
    geo = jnp.asarray(((gy >= 0) & (gy < d.global_ny))[:, None]
                      & ((gx >= 0) & (gx < d.global_nx))[None, :])
    return ((wet_t & geo).astype(dtype),
            (wet_t & (st.xp(tm) == 1)).astype(dtype),
            (wet_t & (st.yp(tm) == 1)).astype(dtype))


class GravityWaveModel:
    """eta/u/v fields on a grid + a fused, jitted multi-step program."""

    def __init__(self, grid: dl.Grid, dt: float, g: float = 9.81,
                 depth: float = 100.0):
        self.grid = grid
        self.dt = float(dt)
        self.g = float(g)
        self.depth = float(depth)

        self.eta = dl.Field(grid, dl.T_POINTS)
        self.u = dl.Field(grid, dl.U_POINTS)
        self.v = dl.Field(grid, dl.V_POINTS)

        dtype = self.eta.dtype
        self._t_upd, self._u_wet, self._v_wet = wet_update_masks(
            grid, dtype)
        # 3-bit code for the Pallas path: 1 B/pt instead of three arrays
        self._mask_codes = jax.device_put(
            st.pack_mask_bits((self._t_upd, self._u_wet, self._v_wet)),
            grid.sharding)
        self._step_cache = {}
        self.use_pallas = False
        self._pallas_interpret = False
        self._pallas_tile_rows = None
        self._sweep_K = 1

    # ------------------------------------------------------------------
    def set_initial_eta(self, eta_global: np.ndarray) -> None:
        stacked = layout.stack_global(self.grid.decomp,
                                      np.asarray(eta_global),
                                      mode="zeros",
                                      dtype=np.dtype(self.eta.dtype))
        self.eta.set_data(stacked)
        self.eta.halo_exchange(1)

    # ------------------------------------------------------------------
    def _step_math(self, eta, u, v, t_upd, u_wet, v_wet):
        """One forward-backward step on a block/window (total reach 1)."""
        g, H, dt = self.g, self.depth, self.dt
        dx, dy = self.grid.dx, self.grid.dy
        u_new = (u - g * dt * st.ddx(eta, dx)) * u_wet
        v_new = (v - g * dt * st.ddy(eta, dy)) * v_wet
        div = st.ddx_back(u_new, dx) + st.ddy_back(v_new, dy)
        eta_new = jnp.where(t_upd > 0, eta - H * dt * div, eta)
        return eta_new, u_new, v_new

    def _block_step(self, exch, eta, u, v, t_upd, u_wet, v_wet):
        """One step on a local block (inside shard_map)."""
        eta, u, v = exch((eta, u, v))
        return self._step_math(eta, u, v, t_upd, u_wet, v_wet)

    # ------------------------------------------------------------------
    def enable_pallas(self, interpret: bool = False,
                      tile_rows: int | None = None,
                      steps_per_sweep: int = 1) -> None:
        """Fused stencil-sweep fast path (ops/sweep.py engine).

        The step's total stencil reach is 1, so up to 8 steps fit one
        sweep (temporal blocking); needs ``halo_width >= steps_per_sweep``
        and TPU-tile-aligned shards (``build(pallas=True)`` sets both)."""
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

        def prepare(aux):
            return st.unpack_mask_bits(aux[0], 3, dtype)

        def stepf(state, prepared, scalars):
            return self._step_math(*state, *prepared)

        return make_stencil_sweep(
            stepf, ly=spec.local_ny, lx=spec.local_nx,
            state_dtypes=(dtype,) * 3, aux_dtypes=(jnp.int8,),
            n_scalars=0, steps_per_sweep=K, reach=1, prepare_fn=prepare,
            tile_rows=self._pallas_tile_rows,
            interpret=self._pallas_interpret,
            repx=spec.repx, repy=spec.repy)

    def step_program(self, nsteps: int = 1,
                     remat_chunk: int | None = None):
        """Compiled program advancing (eta, u, v) by ``nsteps``.

        ``remat_chunk`` bounds the memory of reverse-mode AD through
        the loop (``ops/adjoint.py``): per-step checkpointing, plus a
        two-level scheme when ``remat_chunk > 1``.  Forward results
        are bitwise unchanged."""
        if remat_chunk is not None and (self.use_pallas
                                        or self._sweep_K > 1):
            raise ValueError(
                "remat_chunk needs the plain differentiable jnp path: "
                "build the model without pallas/steps_per_sweep")
        key = (nsteps, remat_chunk)
        if key not in self._step_cache:
            grid = self.grid
            exch = exchange_multi_fn(grid.halo_spec, depth=1)
            K = self._sweep_K
            if K > 1 or self.use_pallas:
                exchK = exchange_multi_fn(grid.halo_spec, depth=max(K, 1))
            if self.use_pallas:
                sweepK = self._make_sweep(K)

            def body(eta, u, v, t_upd, u_wet, v_wet, codes):
                state = (eta, u, v)
                base = 0
                if remat_chunk is not None:
                    from ..ops.adjoint import checkpointed_fori

                    def one(_, s):
                        return self._block_step(exch, *s, t_upd, u_wet,
                                                v_wet)
                    return checkpointed_fori(nsteps, one, state,
                                             remat_chunk)
                if (K > 1 or self.use_pallas) and nsteps >= K:
                    if self.use_pallas:
                        def sweep(_, s):
                            return sweepK(*exchK(s), codes)
                    else:
                        def sweep(_, s):   # jnp comm avoidance
                            s = exchK(s)
                            for _k in range(K):
                                s = self._step_math(*s, t_upd, u_wet,
                                                    v_wet)
                            return tuple(s)
                    state = lax.fori_loop(0, nsteps // K, sweep, state)
                    base = (nsteps // K) * K

                def one(_, s):
                    return self._block_step(exch, *s, t_upd, u_wet, v_wet)
                if nsteps - base:
                    state = lax.fori_loop(0, nsteps - base, one, state)
                return state

            # check_vma=False: pallas_call outputs don't carry varying-
            # mesh-axis metadata; the specs are explicit anyway.
            smapped = jax.shard_map(
                body, mesh=grid.mesh,
                in_specs=(P("y", "x"),) * 7,
                out_specs=(P("y", "x"),) * 3, check_vma=False)
            self._step_cache[key] = jax.jit(smapped)
        return self._step_cache[key]

    def run(self, nsteps: int) -> None:
        prog = self.step_program(nsteps)
        eta, u, v = prog(self.eta.data, self.u.data, self.v.data,
                         self._t_upd, self._u_wet, self._v_wet,
                         self._mask_codes)
        self.eta.data, self.u.data, self.v.data = eta, u, v

    # ------------------------------------------------------------------
    def checksums(self) -> dict:
        return {"eta": self.eta.checksum(), "u": self.u.checksum(),
                "v": self.v.checksum()}

    def gather(self) -> dict:
        return {"eta": self.eta.gather_inner_data(),
                "u": self.u.gather_inner_data(),
                "v": self.v.gather_inner_data()}


def build(gnx: int = 256, gny: int = 256, ndomains=None, dt: float = 0.05,
          g: float = 9.81, depth: float = 10.0, dx: float = 1.0,
          dy: float = 1.0, tmask=None, dtype=None, halo_width: int = 1,
          pallas: bool = False,
          steps_per_sweep: int = 1) -> GravityWaveModel:
    """Convenience constructor: grid + land-ring tmask + model.

    ``pallas=True`` selects the fused stencil-sweep fast path
    (TPU-tile-aligned shards, ``halo_width >= steps_per_sweep``)."""
    from ..ops.fastpath import fast_path_grid_args
    halo_width, align, align_y = fast_path_grid_args(
        pallas, steps_per_sweep, 1, halo_width)
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE, dtype=dtype)
    grid.decompose(gnx, gny, ndomains=ndomains, halo_width=halo_width,
                   align=align, align_y=align_y)
    dl.grid_init(grid, dx, dy, default_tmask(gnx, gny)
                 if tmask is None else tmask)
    model = GravityWaveModel(grid, dt=dt, g=g, depth=depth)
    if pallas:
        model.enable_pallas(steps_per_sweep=steps_per_sweep)
    elif steps_per_sweep > 1:
        model.set_steps_per_exchange(steps_per_sweep)
    return model


def golden_reference(eta0: np.ndarray, tmask: np.ndarray, dx: float,
                     dy: float, dt: float, nsteps: int, g: float = 9.81,
                     depth: float = 100.0) -> dict:
    """Independent NumPy transcription (explicit slicing, fp64) — the

    'NumPy golden reference of the Fortran semantics' of SURVEY §4/§7.
    Operates on plain global arrays with no halos."""
    gny, gnx = eta0.shape
    eta = eta0.astype(np.float64).copy()
    u = np.zeros_like(eta)
    v = np.zeros_like(eta)
    wet = tmask == 1
    u_wet = np.zeros_like(eta)
    u_wet[:, :-1] = (wet[:, :-1] & wet[:, 1:]).astype(np.float64)
    v_wet = np.zeros_like(eta)
    v_wet[:-1, :] = (wet[:-1, :] & wet[1:, :]).astype(np.float64)

    for _ in range(nsteps):
        un = u.copy()
        vn = v.copy()
        un[:, :-1] = u[:, :-1] - g * dt * (eta[:, 1:] - eta[:, :-1]) / dx
        un *= u_wet
        vn[:-1, :] = v[:-1, :] - g * dt * (eta[1:, :] - eta[:-1, :]) / dy
        vn *= v_wet
        div = np.zeros_like(eta)
        div[:, 0] += un[:, 0] / dx
        div[:, 1:] += (un[:, 1:] - un[:, :-1]) / dx
        div[0, :] += vn[0, :] / dy
        div[1:, :] += (vn[1:, :] - vn[:-1, :]) / dy
        eta = np.where(wet, eta - depth * dt * div, eta)
        u, v = un, vn
    return {"eta": eta, "u": u, "v": v}
