"""Financial-trading workload — solver-gated temporal prediction.

Mirrors /root/reference/examples/financial-trading (the System-B gated
predictor from neural-network-implementation applied to a price series).
Run: python examples/financial_trading.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import sublinear_tpu as slt
from sublinear_tpu.models import SystemA, SystemB, Trainer, make_windows
from sublinear_tpu.queries import light_travel_ms


def main():
    # synthetic mid-price series: trend + oscillation + noise
    rng = np.random.default_rng(0)
    t = np.arange(2000, dtype=np.float32)
    series = 100 + 0.002 * t + 0.5 * np.sin(2 * np.pi * t / 50) + 0.05 * rng.normal(size=t.size)

    # returns are the learnable signal
    returns = np.diff(series).astype(np.float32)
    windows, targets = make_windows(returns, window=32, horizon=1)
    split = int(0.8 * len(windows))

    model = SystemA(hidden=24, arch="gru", horizon=1)
    trainer = Trainer(model, window=32, learning_rate=3e-3, seed=1)
    history = trainer.fit(windows[:split], targets[:split], epochs=5, batch_size=128)
    test_mse = trainer.evaluate(windows[split:], targets[split:])
    print(f"System A: train loss {history[0]:.4f} -> {history[-1]:.4f}, test MSE {test_mse:.4f}")

    # System B: Kalman prior + residual net + solver gate
    sysb = SystemB.create(window=32, hidden=16, horizon=1, seed=2)
    pred = sysb.predict(windows[split][:, :])
    print(f"System B gated one-step prediction: {float(pred[0]):+.4f} "
          f"(gate pass rate {sysb.gate.stats.pass_rate:.2f})")

    # temporal budget check: prediction must beat the Tokyo->NYC light time
    import time

    t0 = time.perf_counter()
    sysb.predict(windows[split][:, :])
    ms = (time.perf_counter() - t0) * 1e3
    budget = light_travel_ms(10_900)
    print(f"tick latency {ms:.2f} ms vs light budget {budget:.1f} ms -> "
          f"{'within' if ms < budget else 'over'} budget")


if __name__ == "__main__":
    main()
