"""Streaming solve: per-chunk iterate snapshots.

Parity targets: the streaming surfaces of the reference —
``streamingSolve`` async generator (/root/reference/src/mcp/tools/solver.ts:240-287),
``SolverStream``/``createAsyncIterator`` (/root/reference/server/streaming.js:130-320),
``PartialSolution``/``SolutionChunk`` (/root/reference/src/solver/mod.rs:198-217,
src/types.rs:196-211).

TPU design: the device runs ``chunk_iters`` iterations per dispatch (one
jitted program, warm-restarted from the previous iterate), and the host
yields a SolutionChunk between dispatches.  Chunk granularity trades stream
latency against dispatch overhead; the jitted program is compiled once.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Iterator, Optional

import numpy as np

from ..matrix import Matrix
from ..types import SolutionChunk, SolverOptions
from . import base
from .dispatch import solve


def streaming_solve(
    matrix: Matrix,
    b,
    options: Optional[SolverOptions] = None,
    method: str = "conjugate-gradient",
    chunk_iters: int = 10,
    include_solution: bool = False,
) -> Iterator[SolutionChunk]:
    """Yield SolutionChunk after every ``chunk_iters`` iterations."""
    options = options or SolverOptions()
    threshold = base.threshold_for(b, options)
    t0 = time.perf_counter()
    x = None
    total_iters = 0
    budget = options.max_iterations
    while budget > 0:
        step_opts = dataclasses.replace(
            options, max_iterations=min(chunk_iters, budget), x0=x, check_every=1
        )
        result = solve(matrix, b, step_opts, method=method, raise_on_fail=False)
        x = result.solution
        total_iters += result.iterations
        budget -= max(result.iterations, 1)
        converged = bool(result.residual <= threshold * 1.0000001)
        yield SolutionChunk(
            iteration=total_iters,
            residual=result.residual,
            converged=converged,
            solution=np.asarray(x) if (include_solution or converged) else None,
            timestamp_ms=(time.perf_counter() - t0) * 1e3,
        )
        if converged or result.iterations == 0:
            return
