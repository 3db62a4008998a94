"""Canonical usage example — port of the reference example program

(finite_difference/example/model.f90:54-109): build a 4x10 Arakawa-C
grid with external BCs and NE offset, decompose over every available
device, create U/V/T/F fields, initialise each shard's data with its
(1-based) rank, halo-exchange, and checksum.
"""
from __future__ import annotations

import numpy as np

import dl_esm_inf_tpu as dl
from ..utils.logging import model_write_log


def init_field_by_rank(field: dl.Field) -> None:
    """field%data(:,:) = rank (model.f90:113-121; reference ranks are

    1-based, so shard k holds k+1 everywhere)."""
    d = field.grid.decomp
    stacked = np.empty(field.grid.array_shape, dtype=field.dtype)
    for rank in range(d.ndomains):
        sy, sx = d.shard_slices(rank)
        stacked[sy, sx] = float(rank + 1)
    field.set_data(stacked)


def expected_checksum(field: dl.Field) -> float:
    """Analytic checksum: sum over shards of rank_1based * internal pts."""
    d = field.grid.decomp
    return float(sum((rank + 1) * field.internal_region(rank).npts
                     for rank in range(d.ndomains)))


def run(jpiglo: int = 4, jpjglo: int = 10, ndomains=None) -> dict:
    dl.initialise()
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(jpiglo, jpjglo, ndomains=ndomains)
    tmask = np.ones((jpjglo, jpiglo), dtype=np.int32)
    dl.grid_init(grid, 1.0, 1.0, tmask)

    fields = {name: dl.Field(grid, pts) for name, pts in
              (("u", dl.U_POINTS), ("v", dl.V_POINTS),
               ("t", dl.T_POINTS), ("f", dl.F_POINTS))}
    for fld in fields.values():
        init_field_by_rank(fld)
        fld.halo_exchange(1)

    sums = {name: dl.field_checksum(fld) for name, fld in fields.items()}
    for name, val in sums.items():
        model_write_log(f"{name.upper()} checksum = {val:.8E}")
    model_write_log("Example model set-up complete.")
    dl.finalise()
    return sums


if __name__ == "__main__":
    run()
