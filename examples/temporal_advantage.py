"""Temporal-lead prediction — solve before light arrives.

Mirrors /root/reference/examples/temporal-advantage.
Run: python examples/temporal_advantage.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import sublinear_tpu as slt
from sublinear_tpu.queries import (
    demonstrate_temporal_lead,
    estimate_functional,
    predict_with_temporal_advantage,
)


def main():
    # Tokyo -> NYC trading scenario
    demo = demonstrate_temporal_lead("trading", size=512)
    d = demo["demonstration"]
    print(f"{demo['scenario']['route']}: light {d['lightTravelTimeMs']:.1f} ms, "
          f"compute {d['computeTimeMs']:.2f} ms, lead {d['temporalAdvantageMs']:.1f} ms "
          f"(valid={d['valid']})")

    # functional query t^T A^-1 b without a full solve
    A = slt.Matrix(slt.generate("random-sparse", 512, seed=3, density=0.01).csr.add_diagonal(1.0))
    b = slt.rhs(512, seed=3)
    t = np.zeros(512)
    t[:8] = 1.0 / 8  # average of the first 8 coordinates
    out = estimate_functional(A, b, t, budget=64)
    exact = float(t @ np.linalg.solve(A.to_dense(), b))
    print(f"functional estimate {out['estimate']:.6f} vs exact {exact:.6f} "
          f"(error bound {out['errorBound']:.1e})")


if __name__ == "__main__":
    main()
