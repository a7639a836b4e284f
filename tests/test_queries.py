"""Single-entry / functional estimation and temporal-lead parity tests.

Reference behaviors: estimateEntry (src/core/solver.ts:550-659),
predict_functional (temporal-lead-solver/src/predictor.rs:176-300),
temporal tools (src/mcp/tools/temporal.ts).
"""
import numpy as np
import pytest

import sublinear_tpu as slt
from sublinear_tpu.queries import (
    calculate_light_travel,
    demonstrate_temporal_lead,
    estimate_entries,
    estimate_entry,
    estimate_functional,
    light_travel_ms,
    predict_with_temporal_advantage,
    validate_temporal_advantage,
)


def strong_dd(n=48, seed=5):
    A = slt.Matrix(slt.generate("random-sparse", n, seed=seed, density=0.08).csr.add_diagonal(2.0))
    b = slt.rhs(n, seed=seed)
    x_ref = np.linalg.solve(A.to_dense(), b)
    return A, b, x_ref


def test_estimate_entry_random_walk():
    A, b, x_ref = strong_dd()
    est = estimate_entry(A, b, row=7, method="random-walk",
                         options=slt.SolverOptions(num_walks=4000, seed=3))
    assert abs(est.estimate - x_ref[7]) < 0.05
    assert est.variance >= 0 and est.confidence >= 0


def test_estimate_entry_neumann_is_inverse_entry():
    """Reference parity: method='neumann' returns (A^-1)_{row,col}."""
    A, b, _ = strong_dd(seed=6)
    inv = np.linalg.inv(A.to_dense())
    est = estimate_entry(A, b, row=3, column=11, method="neumann",
                         options=slt.SolverOptions(epsilon=1e-8))
    assert abs(est.estimate - inv[3, 11]) < 1e-4


def test_estimate_entry_backward_push():
    A, b, x_ref = strong_dd(seed=7)
    est = estimate_entry(A, b, row=5, method="backward-push",
                         options=slt.SolverOptions(epsilon=1e-8))
    assert abs(est.estimate - x_ref[5]) < 1e-3


def test_estimate_entry_bounds_checked():
    A, b, _ = strong_dd()
    with pytest.raises(slt.SolverError):
        estimate_entry(A, b, row=999)


def test_estimate_entries_batched():
    A, b, x_ref = strong_dd(seed=8)
    rows = [0, 5, 9, 17, 33]
    est = estimate_entries(A, b, rows, method="random-walk",
                           options=slt.SolverOptions(num_walks=4000, seed=4))
    np.testing.assert_allclose(est, x_ref[rows], atol=0.06)
    est_det = estimate_entries(A, b, rows, method="neumann",
                               options=slt.SolverOptions(epsilon=1e-8))
    np.testing.assert_allclose(est_det, x_ref[rows], atol=1e-4)


def test_estimate_functional_bidirectional():
    A, b, x_ref = strong_dd(seed=9)
    t = slt.rhs(48, seed=100)
    out = estimate_functional(A, b, t, budget=200)
    exact = float(t @ x_ref)
    assert abs(out["estimate"] - exact) < 1e-3 * max(abs(exact), 1.0) + out["errorBound"]
    assert out["sweeps"]["forward"] > 0


def test_light_travel_constants():
    # Tokyo->NYC: 10,900 km => ~36.36ms (TEMPORAL_COMPUTATIONAL_LEAD.md:44-50)
    assert abs(light_travel_ms(10_900) - 36.36) < 0.05


def test_predict_with_temporal_advantage():
    A, b, _ = strong_dd(seed=10)
    out = predict_with_temporal_advantage(A, b, distance_km=10_900)
    assert out["lightTravelTimeMs"] > 36
    assert "summary" in out and out["queryCount"] < 48 / 2 + 200
    assert len(out["solution"]) == 48


def test_validate_temporal_advantage_small():
    out = validate_temporal_advantage(size=256)
    assert out["matrixSize"] == 256
    assert out["converged"]
    assert isinstance(out["valid"], bool)


def test_calculate_light_travel_and_scenarios():
    out = calculate_light_travel(35_786)
    assert out["feasible"]
    demo = demonstrate_temporal_lead("satellite", size=128)
    assert demo["scenario"]["distanceKm"] == 35_786


def test_prove_temporal_lead_certificate():
    from sublinear_tpu.queries import prove_temporal_lead

    out = prove_temporal_lead(size=128, distance_km=10_900)
    assert len(out["steps"]) == 5
    assert out["parameters"]["spectralRadius"] < 1.0
    assert "caveat" in out
    assert isinstance(out["proved"], bool)
