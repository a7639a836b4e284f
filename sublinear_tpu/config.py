"""Backend/dtype configuration.

The framework is TPU-first: float32 compute everywhere by default (TPU has no
hardware f64).  On CPU (tests/oracles) float64 may be requested per-call via
``SolverOptions.dtype`` once ``jax.config.update('jax_enable_x64', True)`` has
been set by the host program.
"""
from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=None)
def backend() -> str:
    import jax

    return jax.default_backend()


@functools.lru_cache(maxsize=None)
def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: Pallas/Mosaic compiles of the large
    crossbar kernels take minutes; caching them on disk makes repeat solves,
    benchmarks, and CLI invocations start in milliseconds.  Opt out with
    SLT_NO_COMPILE_CACHE=1 (e.g. read-only filesystems)."""
    if os.environ.get("SLT_NO_COMPILE_CACHE"):
        return
    import jax

    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def configure_platform(platform: str | None = None) -> None:
    """Select the jax platform for this process (``cpu``/``tpu``/plugin name).

    Priority: explicit argument > ``SLT_PLATFORM`` env var > leave jax's own
    defaults untouched.  Must run before the first jax computation — jax
    snapshots ``JAX_PLATFORMS`` at import, and this container pre-imports jax,
    so an env var set after interpreter start is ignored; the config API is
    the only reliable override (reference exposes no such knob — its backends
    are implicit; here the CLI/MCP/HTTP entry points all honor it)."""
    p = platform or os.environ.get("SLT_PLATFORM")
    if not p:
        return
    import jax

    jax.config.update("jax_platforms", p)
    backend.cache_clear()


def default_dtype():
    import jax.numpy as jnp

    return jnp.float32


def resolve_dtype(dtype):
    import jax.numpy as jnp

    if dtype is None:
        return default_dtype()
    return jnp.dtype(dtype)


# Row-padding granularity: float32 sublane tiling is (8, 128); we keep the
# lane (last) dimension on the row axis in slot-major ELL, so pad rows to 128.
LANE = 128
SUBLANE = 8

# Below this size a dense MXU matvec beats any sparse path on TPU: the
# gather engine costs ~16ns/element (5ns on the wide path) while a dense
# n x n f32 matvec is pure HBM streaming (~0.5 ms at n=10k, 400 MB).  The
# crossover vs ELL gather sits above 10k rows for typical densities; the
# dense memory cost (4 n^2 bytes) is the real bound.
DENSE_THRESHOLD = int(os.environ.get("SLT_DENSE_THRESHOLD", "10240"))


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
