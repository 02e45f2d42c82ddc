"""Test config: run JAX on a virtual 8-device CPU mesh (SURVEY.md §4).

The machine env pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
sitecustomize imports jax at interpreter startup, so env vars alone are too
late — force the platform through jax.config before any backend initializes.
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
# persistent XLA compile cache: reruns of the suite skip CPU recompiles
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
