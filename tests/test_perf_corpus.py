"""Performance corpus: memory profiler, accuracy validator, dashboard.

Reference parity: scripts/performance/{memory_profiler,accuracy_validator,
performance_dashboard,unified_benchmark}.py — the round-1 gap rows.
"""
import numpy as np

import sublinear_tpu as slt


def test_memory_profiler_captures_solve():
    from sublinear_tpu.utils.memory_profiler import profile_solve

    A = slt.generate("random-sparse", 300, seed=1, density=0.03)
    b = slt.rhs(300, seed=1)
    prof = profile_solve(A, b)
    d = prof.to_dict()
    assert d["n"] == 300 and d["nnz"] == A.nnz
    assert d["operation"].startswith("solve[")
    assert d["host_peak_mb"] > 0
    assert d["backend"]


def test_accuracy_validation_rows():
    from sublinear_tpu.benchmarks import accuracy_validation

    rows = accuracy_validation(sizes=(50,), methods=("conjugate-gradient",))
    assert rows
    kinds = {r["kind"] for r in rows}
    assert "dd_symmetric" in kinds
    for r in rows:
        assert "passed" in r
        if "relativeResidual" in r:
            assert np.isfinite(r["relativeResidual"]) or not r["passed"]
    # the easy catalog rows must pass
    easy = [r for r in rows if r["kind"] in ("dd_symmetric", "dd_asymmetric")]
    assert easy and all(r["passed"] for r in easy)


def test_dashboard_structure():
    from sublinear_tpu.benchmarks import dashboard

    rep = dashboard(full=False)
    for key in ("timing", "accuracy", "memory", "complexity", "backend"):
        assert key in rep
    assert rep["accuracy"]["total"] > 0
    assert rep["accuracy"]["passRate"] > 0.5
    assert rep["memory"] and all("device_peak_bytes" in m for m in rep["memory"])
    assert "fit" in rep["complexity"]
