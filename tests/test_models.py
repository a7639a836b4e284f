"""Models layer: Kalman, solver gate, PageRank selection, System A/B training.

Reference behaviors: neural-network-implementation/src/solvers/{kalman,
solver_gate,pagerank_selector}.rs and models/system_{a,b}.rs.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sublinear_tpu.models import (
    KalmanFilter,
    SolverGate,
    GateConfig,
    SystemA,
    SystemB,
    Trainer,
    make_windows,
    select_samples,
    similarity_graph,
)


def test_kalman_tracks_constant_signal():
    kf = KalmanFilter.constant_velocity(q=1e-4, r=1e-2)
    zs = np.full((50, 1), 3.0)
    sT, preds = kf.filter_sequence(zs)
    assert abs(float(preds[-1][0]) - 3.0) < 0.05
    fc = kf.forecast(sT, 5)
    assert np.allclose(np.asarray(fc), 3.0, atol=0.1)


def test_kalman_tracks_linear_trend():
    kf = KalmanFilter.constant_velocity(q=1e-3, r=1e-3)
    t = np.arange(100, dtype=np.float64)
    zs = (0.5 * t)[:, None]
    sT, preds = kf.filter_sequence(zs)
    fc = np.asarray(kf.forecast(sT, 3)).reshape(-1)
    expect = 0.5 * np.array([100, 101, 102])
    np.testing.assert_allclose(fc, expect, atol=0.5)


def test_solver_gate_passes_good_and_stats():
    gate = SolverGate(dim=8, config=GateConfig(tolerance=1e-2, max_iterations=30))
    x = np.random.default_rng(0).normal(size=(5, 8))
    err, passed = gate.verify(x)
    assert passed.all(), f"certificate errors {err}"
    assert gate.stats.total == 5 and gate.stats.pass_rate == 1.0


def test_solver_gate_rejects_with_tiny_budget():
    gate = SolverGate(dim=8, config=GateConfig(tolerance=1e-8, max_iterations=1))
    x = np.random.default_rng(1).normal(size=(4, 8))
    err, passed = gate.verify(x)
    assert not passed.all()
    fallback = np.zeros((4, 8))
    out = gate.gate(x, fallback)
    assert out.shape == (4, 8)


def test_pagerank_selector_prefers_cluster_cores():
    rng = np.random.default_rng(2)
    cluster = rng.normal(0, 0.1, size=(20, 4))
    # isolated, mutually-distant outliers: only teleport mass reaches them
    outliers = np.array([[50.0] * 4, [-70.0] * 4, [120.0, -120.0, 90.0, -90.0]])
    feats = np.vstack([cluster, outliers])
    out = select_samples(feats, num_select=5, k=4)
    assert len(out["selected"]) == 5
    assert set(out["selected"]) <= set(range(20))  # outliers not selected
    g = similarity_graph(feats, k=4)
    assert g.shape == (23, 23)


def test_system_a_trains_on_sine():
    t = np.arange(400, dtype=np.float32)
    series = np.sin(2 * np.pi * t / 25)
    windows, targets = make_windows(series, window=16, horizon=1)
    model = SystemA(hidden=16, arch="gru", horizon=1)
    trainer = Trainer(model, window=16, features=1, learning_rate=5e-3)
    history = trainer.fit(windows[:256], targets[:256], epochs=6, batch_size=64)
    assert history[-1] < history[0]
    assert history[-1] < 0.1


def test_system_a_tcn_forward():
    model = SystemA(hidden=8, arch="tcn", horizon=2)
    trainer = Trainer(model, window=12, features=1)
    pred = trainer.predict(np.zeros((12, 1), dtype=np.float32))
    assert pred.shape == (2,)


def test_system_b_gated_prediction():
    sysb = SystemB.create(window=16, features=1, hidden=8, horizon=1)
    window = np.linspace(0, 1.5, 16)[:, None].astype(np.float32)
    pred = sysb.predict(window)
    assert pred.shape == (1,)
    assert np.isfinite(pred).all()
    # gate tracked the verification
    assert sysb.gate.stats.total >= 1
