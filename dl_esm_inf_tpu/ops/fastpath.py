"""Light (pallas-free) helpers shared by sweep-engine client models."""
from __future__ import annotations

RING = 8          # window ring rows per side (Mosaic f32 sublane tile)


def enable_fast_path(model, *, reach: int, interpret: bool = False,
                     tile_rows: int | None = None,
                     steps_per_sweep: int = 1) -> None:
    """Shared fast-path switch for sweep-engine client models.

    Validates that K sub-steps of the given stencil ``reach`` fit the
    window ring and the shard halo, then flips the model's fast-path
    attributes (``use_pallas``, ``_sweep_K``, ...) and clears its
    program cache."""
    K = int(steps_per_sweep)
    kmax = RING // reach
    if not 1 <= K <= kmax:
        raise ValueError(
            f"steps_per_sweep must be in [1, {kmax}], got {K}")
    # Over-decomposed grids (repx/repy > 1) are supported: the sweep
    # runs once per logical tile and the ppermute exchange handles the
    # intra-block seams (ops/sweep.py repx/repy).  Only the fused
    # remote-DMA transport is one-tile-per-device (it raises there).
    need = max(K * reach, reach)
    if model.grid.halo_spec.halo < need:
        raise ValueError(
            f"the fused sweep with steps_per_sweep={K} needs "
            f"halo_width >= {need} (build(..., halo_width={need}))")
    model.use_pallas = True
    model._pallas_interpret = interpret
    model._pallas_tile_rows = tile_rows
    model._sweep_K = K
    model._step_cache.clear()


def set_steps_per_exchange(model, *, reach: int,
                           steps_per_sweep: int) -> None:
    """Communication avoidance on the PLAIN jnp path: K chained steps
    per depth-K*reach exchange — the fused engine's schedule without
    Pallas.  Divides the collective count by K on meshes where exchange
    latency (DCN hops) dominates.  Needs ``halo_width >= K*reach``
    only: the jnp shifts are whole-block rolls, so the Pallas window
    ring's K*reach <= 8 cap does not apply here."""
    K = int(steps_per_sweep)
    if K < 1:
        raise ValueError(f"steps_per_sweep must be >= 1, got {K}")
    need = max(K * reach, reach)
    if model.grid.halo_spec.halo < need:
        raise ValueError(
            f"steps_per_sweep={K} needs halo_width >= {need}")
    model._sweep_K = K
    model._step_cache.clear()


def fast_path_grid_args(pallas: bool, steps_per_sweep: int, reach: int,
                        halo_width: int) -> tuple[int, int, int]:
    """(halo_width, align, align_y) for a model ``build()``: TPU lane/
    sublane alignment and a halo deep enough for the K-step sweep (the
    jnp comm-avoidance schedule needs the same deep halo, minus the
    tile alignment)."""
    if not pallas:
        if steps_per_sweep > 1:
            return max(halo_width, steps_per_sweep * reach), 1, 1
        return halo_width, 1, 1
    return max(halo_width, steps_per_sweep * reach, reach), 128, 8
