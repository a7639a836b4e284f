"""Shared solver driver machinery.

The reference drives every algorithm with a host-side loop
(``SolverAlgorithm::solve`` /root/reference/src/solver/mod.rs:223-333, the TS
loops in /root/reference/src/core/solver.ts).  TPU-first re-design: the whole
iteration runs on-device inside one ``lax.while_loop`` — residuals are
measured every ``check_every`` iterations (reference's every-5 pattern,
src/core/solver.ts:166) without any host round-trips, and the host gets back
(x, iterations, residual) in a single transfer.
"""
from __future__ import annotations

import time
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import ConvergenceError, NumericalInstabilityError
from ..matrix import Matrix
from ..types import SolverOptions, SolverResult, SolverStats

HUGE_RES = 1e30


def norm_mode_of(options: SolverOptions) -> str:
    """Map ConvergenceMode (reference: src/types.rs:10-34) to a norm tag."""
    from ..types import ConvergenceMode

    mode = options.convergence_mode
    if mode in (ConvergenceMode.L1_RESIDUAL,):
        return "l1"
    if mode in (ConvergenceMode.MAX_RESIDUAL,):
        return "max"
    return "l2"  # L2, RELATIVE_CHANGE and COMBINED check the l2 residual


def device_norm(v, mode: str):
    import jax.numpy as jnp

    if mode == "l1":
        return jnp.sum(jnp.abs(v))
    if mode == "max":
        return jnp.max(jnp.abs(v))
    return jnp.linalg.norm(v)


def host_norm(v, mode: str) -> float:
    v = np.asarray(v, dtype=np.float64)
    if mode == "l1":
        return float(np.abs(v).sum())
    if mode == "max":
        return float(np.abs(v).max()) if v.size else 0.0
    return float(np.linalg.norm(v))


def threshold_for(b: np.ndarray, options: SolverOptions) -> float:
    """Absolute threshold (in the configured norm) implementing
    relative/absolute convergence."""
    if options.convergence == "absolute":
        return float(options.epsilon)
    nb = host_norm(b, norm_mode_of(options))
    return float(options.epsilon) * max(nb, 1e-30)


def while_iterate(step_block: Callable, residual_of: Callable, state0, threshold, max_iters: int, check_every: int):
    """Generic on-device driver.

    ``step_block(state)``   advances the iterate by ``check_every`` steps
    ``residual_of(state)``  returns the l2 residual of the current iterate

    Carry is (state, k, res).  Stops on convergence, divergence (non-finite or
    exploding residual — the reference's NumericalInstability check,
    src/solver/mod.rs:272-279), or iteration budget.
    """
    res0 = residual_of(state0)

    def cond(carry):
        _, k, res = carry
        ok = (res > threshold) & (k < max_iters)
        finite = jnp.isfinite(res) & (res < HUGE_RES)
        return ok & finite

    def body(carry):
        state, k, _ = carry
        state = step_block(state)
        return state, k + check_every, residual_of(state)

    return jax.lax.while_loop(cond, body, (state0, jnp.int32(0), res0))


def repeat_steps(step: Callable, n: int) -> Callable:
    """Compose ``n`` single steps into one block (n is static)."""

    def block(state):
        return jax.lax.fori_loop(0, n, lambda _, s: step(s), state)

    return block


class SolveTimer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self.t0) * 1e3
        return False


def finalize(
    matrix: Matrix,
    x_pad: jax.Array,
    iterations,
    residual,
    method: str,
    options: SolverOptions,
    elapsed_ms: float,
    matvec_count: int = 0,
) -> SolverResult:
    n = matrix.shape[0]
    x = np.asarray(jax.device_get(x_pad), dtype=np.float64)[:n]
    res = float(jax.device_get(residual))
    thr = 0.0  # converged flag is decided by the caller via residual
    result = SolverResult(
        solution=x,
        iterations=int(jax.device_get(iterations)),
        residual=res,
        converged=bool(np.isfinite(res)),
        method=method,
        compute_time_ms=elapsed_ms,
    )
    if options.collect_stats:
        nnz = matrix.nnz
        secs = max(elapsed_ms / 1e3, 1e-12)
        result.stats = SolverStats(
            total_time_ms=elapsed_ms,
            matvec_count=matvec_count,
            flops=2 * nnz * matvec_count,
            nnz_per_second=nnz * matvec_count / secs,
            backend=jax.default_backend(),
            device_count=jax.device_count(),
        )
    return result


def check_outcome(result: SolverResult, threshold: float, options: SolverOptions, raise_on_fail: bool):
    result.converged = bool(np.isfinite(result.residual) and result.residual <= threshold * 1.0000001)
    if not result.converged and raise_on_fail:
        if not np.isfinite(result.residual) or result.residual >= HUGE_RES:
            raise NumericalInstabilityError(
                f"{result.method} diverged (residual={result.residual})",
                {"iterations": result.iterations},
            )
        raise ConvergenceError(
            f"{result.method} failed to converge after {result.iterations} iterations; "
            f"residual {result.residual:.3e} > threshold {threshold:.3e}",
            {"residual": result.residual, "iterations": result.iterations, "threshold": threshold},
        )
    return result
