"""ErrorBounds + RELATIVE_CHANGE/COMBINED convergence modes + estimate CIs.

Reference semantics: ErrorBounds struct /root/reference/src/types.rs:60-69,
geometric-tail estimate /root/reference/src/solver/neumann.rs:321-347,
ConvergenceMode /root/reference/src/types.rs:10-34, estimateEntry confidence
/root/reference/src/core/solver.ts:550-659.
"""
import numpy as np

import sublinear_tpu as slt
from sublinear_tpu.types import ConvergenceMode, SolverOptions


def _system(n=80, seed=0):
    A = slt.generate("random-sparse", n, seed=seed, density=0.08)
    b = slt.rhs(n, seed=seed)
    x_true = np.linalg.solve(A.to_dense(), b)
    return A, b, x_true


def test_neumann_error_bounds_cover_true_error():
    A, b, x_true = _system()
    r = slt.solve(A, b, method="neumann", epsilon=1e-6)
    eb = r.error_bounds
    assert eb is not None and eb.is_valid()
    assert eb.method in ("deterministic", "neumann_truncation")
    true_err = np.abs(r.solution - x_true).max()
    assert eb.upper_bound >= true_err * 0.999
    assert "errorBounds" in r.to_dict()


def test_cg_error_bounds_cover_true_error():
    A, b, x_true = _system(seed=3)
    r = slt.solve(A, b, method="conjugate-gradient", epsilon=1e-6)
    eb = r.error_bounds
    assert eb is not None and eb.is_valid() and eb.method == "deterministic"
    assert eb.upper_bound >= np.abs(r.solution - x_true).max() * 0.999


def test_no_bounds_for_non_dd():
    n = 40
    rng = np.random.default_rng(5)
    D = rng.standard_normal((n, n)) * 0.3 + np.eye(n) * 0.1  # not DD
    A = slt.Matrix.from_dense(D + D.T + np.eye(n) * 3)  # SPD-ish but weak rows
    if A.dominance_gap() <= 0:
        b = slt.rhs(n, seed=5)
        r = slt.solve(A, b, method="conjugate-gradient", epsilon=1e-5,
                      raise_on_fail=False)
        assert r.error_bounds is None or r.error_bounds.method != "deterministic" or A.dominance_gap() > 0


def test_relative_change_mode_converges():
    A, b, _ = _system(seed=7)
    opts = SolverOptions(method="jacobi", epsilon=1e-5,
                         convergence_mode=ConvergenceMode.RELATIVE_CHANGE)
    r = slt.solve(A, b, opts)
    assert r.converged
    # the change criterion at 1e-5 must have actually stopped the iteration
    # near the solution (DD system: change bound implies small error)
    x_true = np.linalg.solve(A.to_dense(), b)
    assert np.abs(r.solution - x_true).max() < 1e-2


def test_combined_mode_requires_residual_too():
    A, b, _ = _system(seed=9)
    opts = SolverOptions(method="neumann", epsilon=1e-6,
                         convergence_mode=ConvergenceMode.COMBINED)
    r = slt.solve(A, b, opts)
    assert r.converged
    # converged under COMBINED implies the residual condition held as well
    res = np.linalg.norm(A.csr.matvec(r.solution) - b)
    assert res <= 1e-6 * np.linalg.norm(b) * 1.1


def test_estimate_entry_confidence_interval():
    from sublinear_tpu.queries import estimate_entry

    A, b, x_true = _system(seed=11)
    est = estimate_entry(A, b, row=3, method="random-walk", epsilon=1e-2,
                         confidence=0.95)
    d = est.to_dict()
    assert "confidenceInterval" in d and len(d["confidenceInterval"]) == 2
    lo, hi = d["confidenceInterval"]
    assert lo <= est.estimate <= hi
    assert d["confidenceLevel"] == 0.95

    # neumann method estimates the resolvent entry (A^-1)[row, col]
    est2 = estimate_entry(A, b, row=3, column=0, method="neumann", epsilon=1e-6)
    truth = np.linalg.inv(A.to_dense())[3, 0]
    lo2, hi2 = est2.confidence_interval
    assert lo2 <= truth <= hi2  # deterministic interval covers truth
