"""Test configuration: force an 8-device CPU mesh + fp64.

The analogue of the reference CI running `mpirun --oversubscribe -np N`
on one VM (.github/workflows/makefile-test.yml:59): shards are the unit
of "node".  Must run before any JAX backend is initialised.
"""
import os

# Neutralise the axon TPU-tunnel site hook if present, then pick CPU.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA:CPU re-compiles are a large share of
# the suite's wall-clock; entries are keyed per backend so CPU and TPU
# runs never collide.
from dl_esm_inf_tpu.utils import compilation_cache  # noqa: E402

compilation_cache.enable()
