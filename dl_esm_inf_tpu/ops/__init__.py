"""Per-chip compute: stencil primitives and the fused sweep engine."""
from . import stencils  # noqa: F401
from .sweep import make_stencil_sweep  # noqa: F401
