"""StreamingOperator (larger-than-HBM analog) + E007 memory guard.

Reference parity: /root/reference/src/matrix/optimized.rs:451+
(StreamingMatrix chunked processing) and the E007 MEMORY_LIMIT_EXCEEDED
error that round 1 defined but never raised.
"""
import numpy as np
import pytest

import sublinear_tpu as slt
from sublinear_tpu.errors import MemoryLimitError
from sublinear_tpu.formats.streaming import (
    StreamingOperator,
    check_memory_budget,
    estimate_op_bytes,
    memory_budget_bytes,
    solve_streaming,
)


def test_estimate_scales_with_kind():
    A = slt.generate("random-sparse", 300, seed=1, density=0.05)
    dense = estimate_op_bytes(A.csr, "dense")
    ell = estimate_op_bytes(A.csr, "ell")
    assert dense > 300 * 300 * 4 * 0.9
    assert 0 < ell < dense


def test_memory_guard_raises_e007(monkeypatch):
    A = slt.generate("random-sparse", 400, seed=2, density=0.05)
    with pytest.raises(MemoryLimitError) as ei:
        check_memory_budget(A.csr, "dense", budget=1000)
    assert ei.value.code == "E007"
    assert ei.value.details["requiredBytes"] > 1000


def test_op_build_respects_env_budget(monkeypatch):
    monkeypatch.setenv("SLT_MEMORY_LIMIT_BYTES", "10000")
    A = slt.generate("random-sparse", 600, seed=3, density=0.05)
    with pytest.raises(MemoryLimitError):
        A.op()


def test_streaming_matvec_matches_oracle():
    n = 500
    A = slt.generate("random-sparse", n, seed=4, density=0.04)
    # small panel budget to force several panels
    op = StreamingOperator(A.csr, panel_budget=4096)
    assert op.n_panels > 1
    x = np.random.default_rng(0).standard_normal(n)
    np.testing.assert_allclose(op.matvec(x), A.to_dense() @ x, rtol=1e-5, atol=1e-5)


def test_solve_streaming_converges():
    n = 400
    A = slt.generate("random-sparse", n, seed=5, density=0.04)
    b = slt.rhs(n, seed=5)
    r = solve_streaming(A, b, slt.SolverOptions(epsilon=1e-6))
    assert r.converged and r.method == "neumann-streaming"
    res = np.linalg.norm(A.csr.matvec(r.solution) - b)
    assert res <= 1e-6 * np.linalg.norm(b) * 1.1


def test_budget_default_sane():
    assert memory_budget_bytes() > 1 * 1024**3
