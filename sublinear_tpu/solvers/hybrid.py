"""Hybrid solver: push -> random-walk refinement -> Krylov polish.

Reference: the 3-phase HybridSolver (/root/reference/src/solver/hybrid.rs:
221-327 — (1) forward push per nonzero b_i, (2) random-walk refinement with a
decaying blend, (3) CG polish; phase switching on improvement rate
:350-376 and global-best tracking :383-389).

TPU orchestration: each phase is an independently jitted on-device program;
the host only switches phases (three dispatches total, no per-iteration
host sync).  Phase budgets replace the reference's improvement-rate window:
push gets 1/4 of the iteration budget, MC refinement runs only when the push
residual stalls above threshold, and the Krylov polish finishes from the best
iterate (warm start), tracking the reference's global-best semantics.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..matrix import Matrix
from ..types import SolverOptions, SolverResult
from . import base, cg as _cg, push as _push


def solve_hybrid(matrix: Matrix, b, options: SolverOptions, raise_on_fail: bool = True) -> SolverResult:
    threshold = base.threshold_for(b, options)
    phases = []

    # Phase 1: frontier push (reference hybrid.rs:221-248)
    push_opts = dataclasses.replace(
        options, max_iterations=max(options.max_iterations // 4, 8)
    )
    p1 = _push.solve_push(matrix, b, push_opts, direction="forward-push", raise_on_fail=False)
    phases.append({"phase": "push", "iterations": p1.iterations, "residual": p1.residual})
    best = p1
    if p1.converged:
        p1.method = "hybrid"
        p1.stats = None
        p1.phases = phases
        return p1

    # Phase 2: random-walk refinement with decaying blend (hybrid.rs:251-279).
    # Only worth the walkers when the push iterate is still far away.
    if p1.residual > 1e3 * threshold and matrix.shape[0] <= 4096:
        from . import random_walk as _rw

        rw_opts = dataclasses.replace(options, num_walks=64)
        est, _, steps = _rw.walk_estimate(matrix, b, np.arange(matrix.shape[0]), rw_opts)
        blend = 0.5
        mixed = (1 - blend) * p1.solution + blend * est
        res_mixed = float(
            np.linalg.norm(matrix.csr.matvec(mixed) - np.asarray(b, dtype=np.float64))
        )
        phases.append({"phase": "random-walk", "iterations": steps, "residual": res_mixed})
        if res_mixed < p1.residual:  # global-best tracking (hybrid.rs:383-389)
            best = dataclasses.replace(p1, solution=mixed, residual=res_mixed)

    # Phase 3: Krylov polish from the best iterate (hybrid.rs:283-327)
    polish_opts = dataclasses.replace(options, x0=best.solution)
    from ..analysis import analyze

    sym = analyze(matrix, estimate_condition=False).is_symmetric
    p3 = (
        _cg.solve_cg(matrix, b, polish_opts, raise_on_fail=raise_on_fail)
        if sym
        else _cg.solve_bicgstab(matrix, b, polish_opts, raise_on_fail=raise_on_fail)
    )
    phases.append({"phase": "krylov", "iterations": p3.iterations, "residual": p3.residual})

    p3.method = "hybrid"
    p3.iterations += p1.iterations
    p3.compute_time_ms += p1.compute_time_ms
    p3.memory_used = 0
    p3.phases = phases
    return p3
