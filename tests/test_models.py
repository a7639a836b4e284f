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


def test_quantization_roundtrip_schemes():
    from sublinear_tpu.models import quantization_error, quantize_tree

    model = SystemA(hidden=16, arch="gru", horizon=1)
    trainer = Trainer(model, window=16, features=1)
    params = trainer.state.params["params"]
    errors = {}
    for scheme in ["int8", "int4", "binary"]:
        qp = quantize_tree(params, scheme=scheme)
        info = quantization_error(params, qp)
        errors[scheme] = info["relative_l2_error"]
        assert info["size_bytes"] > 0
    # error ordering: int8 < int4 < binary; int8 must be tight
    assert errors["int8"] < 0.01
    assert errors["int8"] < errors["int4"] < errors["binary"]


def test_quantized_inference_matches_f32():
    from sublinear_tpu.models import quantize_tree, quantized_apply

    t = np.arange(400, dtype=np.float32)
    series = np.sin(2 * np.pi * t / 25)
    windows, targets = make_windows(series, window=16, horizon=1)
    model = SystemA(hidden=16, arch="gru", horizon=1)
    trainer = Trainer(model, window=16, features=1, learning_rate=5e-3)
    trainer.fit(windows[:256], targets[:256], epochs=4, batch_size=64)

    w = np.asarray(windows[300], dtype=np.float32)
    full = np.asarray(trainer.predict(w))
    qp = quantize_tree(trainer.state.params["params"], scheme="int8")
    quant = np.asarray(quantized_apply(model.apply, qp, jnp.asarray(w)))
    assert quant.shape == full.shape
    np.testing.assert_allclose(quant, full, atol=0.05)


def test_quantize_rejects_bad_scheme_and_empty():
    from sublinear_tpu.errors import InvalidParametersError
    from sublinear_tpu.models import quantize_tree

    with pytest.raises(InvalidParametersError):
        quantize_tree({"w": np.ones((4, 4), np.float32)}, scheme="int2")
    with pytest.raises(InvalidParametersError):
        quantize_tree({}, scheme="int8")
