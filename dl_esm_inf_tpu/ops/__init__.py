"""Per-chip compute: stencil primitives and the fused sweep engine."""
from . import stencils  # noqa: F401


def __getattr__(name):
    # lazy: keep jax.experimental.pallas off the pure-jnp import path
    if name in ("make_stencil_sweep", "enable_fast_path",
                "fast_path_grid_args", "sweep"):
        from . import sweep
        return sweep if name == "sweep" else getattr(sweep, name)
    raise AttributeError(name)
