"""Field output utilities.

Analogue of the reference's test-only gnuplot ``dump_field``
(tests/dist_mem/test_halos.f90:267-338): write a field (with physical
coordinates) for inspection, plus a compact .npz form.
"""
from __future__ import annotations

import numpy as np

from ..core import layout
from ..core.field import Field


def dump_field(field: Field, path: str, halo_depth: int = 0,
               fmt: str = "npz") -> None:
    """Write one field's global internal data (optionally with the
    per-rank local block views, halo ring included, for halo debugging).

    fmt='npz'  -> arrays x, y, data (global, internal points); with
                  ``halo_depth > 0`` also ``local_views`` of shape
                  (nranks, local_ny, local_nx) — each rank's raw block
                  including its halo/padding cells
    fmt='dat'  -> gnuplot-style "x y value" triples, blank-line-separated
                  rows (the reference's dump format; internal points only)
    """
    g = field.gather_inner_data()
    d = field.grid.decomp
    # global T coordinates of internal points (reference xt/yt formula)
    x = (np.arange(d.global_nx) + 1) * field.grid.dx
    y = (np.arange(d.global_ny) + 1) * field.grid.dy
    if fmt == "npz":
        extra = {}
        if halo_depth > 0:
            # ONE host gather, sliced per rank (field.local_view would
            # re-gather the whole stacked array for every rank)
            stacked = field.get_data()
            extra["local_views"] = np.stack(
                [np.asarray(layout.shard_view(d, stacked, r))
                 for r in range(d.ndomains)])
        np.savez_compressed(path, x=x, y=y, data=g, **extra)
    elif fmt == "dat":
        levels = g.reshape((1,) + g.shape) if g.ndim == 2 else g
        with open(path, "w") as f:
            for k in range(levels.shape[0]):
                if levels.shape[0] > 1:
                    f.write(f"# level {k}\n")
                gk = levels[k]
                for j in range(gk.shape[0]):
                    for i in range(gk.shape[1]):
                        f.write(f"{x[i]:.6e} {y[j]:.6e} {gk[j, i]:.6e}\n")
                    f.write("\n")
    else:
        raise ValueError(f"unknown dump format {fmt!r}")


def load_dump(path: str) -> dict:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}
