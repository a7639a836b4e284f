"""Test configuration: force an 8-device virtual CPU mesh.

Tests always run on CPU (deterministic, f64-capable for oracles) with 8
virtual devices so sharding/mesh tests exercise real multi-device programs
without TPU hardware.  Must run before jax is imported anywhere.
"""
import os
import sys

# Force CPU even when the outer environment points at a TPU (JAX_PLATFORMS=axon):
# tests need determinism, f64 oracles, and the 8-device virtual mesh.
_platform = os.environ.get("SLT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This container preloads jax via sitecustomize, so jax's config already
# snapshotted JAX_PLATFORMS=axon (the TPU tunnel) — override via the config
# API, which works whether or not jax was imported early.
import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_dd_system(n=64, density=0.1, seed=0, strength=1.5):
    """Small DD system + NumPy f64 oracle solution."""
    import sublinear_tpu as slt

    A = slt.generate("random-sparse", n, seed=seed, density=density)
    b = slt.rhs(n, seed=seed)
    x_ref = np.linalg.solve(A.to_dense(), b)
    return A, b, x_ref
