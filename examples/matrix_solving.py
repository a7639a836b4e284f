"""Matrix solving — every method on one system, plus mixed-precision
refinement.

Mirrors /root/reference/examples/matrix-solving.
Run: python examples/matrix_solving.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import sublinear_tpu as slt
from sublinear_tpu.solvers.refine import solve_refined


def main():
    A = slt.Matrix(slt.generate("random-sparse", 256, seed=9, density=0.03).csr.add_diagonal(1.0))
    b = slt.rhs(256, seed=9)
    x_ref = np.linalg.solve(A.to_dense(), b)

    methods = ["neumann", "conjugate-gradient", "bicgstab", "jacobi",
               "gauss-seidel", "forward-push", "bidirectional", "hybrid"]
    print(f"{'method':20s} {'iters':>6s} {'residual':>10s} {'max err':>10s}")
    for m in methods:
        r = slt.solve(A, b, method=m, epsilon=1e-6, raise_on_fail=False)
        err = np.abs(r.solution - x_ref).max()
        print(f"{r.method:20s} {r.iterations:6d} {r.residual:10.2e} {err:10.2e}")

    # Monte-Carlo estimate of a single entry (sublinear query)
    from sublinear_tpu.queries import estimate_entry

    est = estimate_entry(A, b, row=17, method="random-walk",
                         options=slt.SolverOptions(num_walks=2000, seed=4))
    print(f"\nentry x[17]: MC estimate {est.estimate:+.5f} vs exact {x_ref[17]:+.5f} "
          f"(+-{est.confidence:.4f} at 95%)")

    # mixed-precision refinement below the f32 floor
    r = solve_refined(A, b, slt.SolverOptions(epsilon=1e-11))
    rel = np.linalg.norm(A.csr.matvec(r.solution) - b) / np.linalg.norm(b)
    print(f"refined ({r.method}): relative residual {rel:.1e}")


if __name__ == "__main__":
    main()
