"""Basic usage — generate, analyze, solve, verify.

Mirrors /root/reference/examples/basic-usage.js.
Run: python examples/basic_usage.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import sublinear_tpu as slt


def main():
    # 1. generate a diagonally-dominant test system
    A = slt.generate("random-sparse", 500, seed=42, density=0.01)
    b = slt.rhs(500, seed=42)

    # 2. analyze it
    analysis = slt.analyze(A)
    print(f"matrix: {A.shape[0]}x{A.shape[1]}, nnz={A.nnz}")
    print(f"diagonally dominant: {analysis.is_diagonally_dominant} "
          f"(strength {analysis.dominance_strength:.3f})")
    print(f"recommended method: {analysis.recommended_method}")

    # 3. solve with the recommended method (adaptive dispatch)
    result = slt.solve(A, b, method="adaptive", epsilon=1e-6)
    print(f"solved by {result.method}: {result.iterations} iterations, "
          f"residual {result.residual:.2e}, {result.compute_time_ms:.1f} ms")

    # 4. verify independently
    rel = np.linalg.norm(A.csr.matvec(result.solution) - b) / np.linalg.norm(b)
    print(f"verified relative residual: {rel:.2e}")

    # 5. warm restart after a small RHS change (online/incremental story)
    b2 = b.copy()
    b2[7] += 0.01
    r2 = slt.solve(A, b2, method=result.method, epsilon=1e-6, x0=result.solution)
    print(f"warm restart after delta: {r2.iterations} iterations")


if __name__ == "__main__":
    main()
