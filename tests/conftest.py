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

# Modules whose every test is tier-`slow`: the torch/reference oracle
# differentials (f64 graph builds + full-protocol runs) and the
# multi-process cluster tests.  These dominate the suite wall time
# (docs/TESTING.md records the measured split); the quick tier
# (`pytest -m "not slow"`) is the per-edit feedback loop, the full suite
# (`pytest tests/ -q`, no filter) is the pre-commit / CI gate.
SLOW_MODULES = {
    "test_cocoeval_differential",
    "test_distributed",
    "test_export_stablehlo",
    "test_export_torch_ckpt",
    "test_reference_augment_parity",
    "test_reference_dataset_parity",
    "test_reference_eval_parity",
    "test_reference_heatmap_parity",
    "test_reference_parity",
    "test_reference_train_parity",
    "test_torch_parity",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
