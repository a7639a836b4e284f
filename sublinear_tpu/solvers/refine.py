"""Mixed-precision iterative refinement.

SURVEY.md §7 flags f32-on-TPU vs the f64 reference as "the single biggest
precision risk": plain f32 solves floor at ~2e-7 relative residual.  This
module implements classic iterative refinement:

    repeat:  r = b - A x      (exact, f64 on host over the CSR)
             solve A d = r    (fast, f32 on device, warm compiled program)
             x = x + d        (f64 accumulation on host)

The device does all the heavy lifting in f32; the host pays one O(nnz) f64
matvec per refinement step.  Achievable relative residual ~1e-12 (f64
rounding), matching the reference's f64 tolerances.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from ..matrix import Matrix
from ..types import SolverOptions, SolverResult
from .dispatch import solve


def solve_refined(
    matrix: Matrix,
    b,
    options: Optional[SolverOptions] = None,
    method: Optional[str] = None,
    max_refinements: int = 4,
    raise_on_fail: bool = True,
) -> SolverResult:
    """Solve to ``options.epsilon`` in f64-exact residual terms."""
    options = options or SolverOptions()
    b64 = np.asarray(b, dtype=np.float64).reshape(-1)
    nb = max(float(np.linalg.norm(b64)), 1e-300)
    target_abs = (
        float(options.epsilon) * nb if options.convergence == "relative" else float(options.epsilon)
    )

    # inner f32 solves run to their own floor (slightly looser inner epsilon)
    inner = dataclasses.replace(options, convergence="relative", epsilon=max(options.epsilon, 1e-6))

    t0 = time.perf_counter()
    x = np.zeros_like(b64)
    total_iters = 0
    inner_method = method
    residual = float("inf")
    for step in range(max_refinements + 1):
        r = b64 - matrix.csr.matvec(x)  # exact f64 residual
        residual = float(np.linalg.norm(r))
        if residual <= target_abs:
            break
        step_opts = dataclasses.replace(inner, x0=None)
        result = solve(matrix, r, step_opts, method=inner_method, raise_on_fail=False)
        inner_method = result.method if inner_method is None else inner_method
        total_iters += result.iterations
        if not np.all(np.isfinite(result.solution)):
            break
        x = x + result.solution

    wall = (time.perf_counter() - t0) * 1e3
    out = SolverResult(
        solution=x,
        iterations=total_iters,
        residual=residual,
        converged=residual <= target_abs * 1.0000001,
        method=f"refined({inner_method})",
        compute_time_ms=wall,
    )
    if not out.converged and raise_on_fail:
        from ..errors import ConvergenceError

        raise ConvergenceError(
            f"iterative refinement stalled at residual {residual:.3e} (target {target_abs:.3e})",
            {"residual": residual, "target": target_abs, "iterations": total_iters},
        )
    return out
