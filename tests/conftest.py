"""Test configuration: run everything on a virtual 8-device CPU mesh so the
suite needs no TPU and the multi-chip sharding paths are exercised.

Note: this machine's sitecustomize registers an 'axon' TPU platform and
overrides JAX_PLATFORMS at import, so we must force CPU via jax.config
*after* importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the demo-validation tests compile many engine
# variants; warm cache turns reruns from ~30 min into minutes
from dem_engine_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()
