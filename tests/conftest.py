"""Test config: run everything on a virtual 8-device CPU mesh.

This environment's sitecustomize registers the `axon` TPU backend and pins
`jax_platforms` via jax.config (which takes precedence over env vars), so
JAX_PLATFORMS/XLA_FLAGS are ignored — override through jax.config instead,
before any backend is initialized (SURVEY.md section 4: shard tests on a
forced CPU device count without TPUs).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
