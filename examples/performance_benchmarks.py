"""Performance benchmarks — cross-domain runner + complexity fit.

Mirrors /root/reference/examples/performance-benchmarks and
scripts/performance/unified_benchmark.py.
Run: python examples/performance_benchmarks.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sublinear_tpu.benchmarks import run_all, scaling_study


def main():
    print("== cross-domain benchmarks (n=1000) ==")
    for r in run_all(sizes=(1000,), reps=2):
        print(f"{r.name:28s} {r.wall_ms:9.2f} ms  converged={r.converged}")

    print("\n== scaling study + empirical complexity fit ==")
    study = scaling_study(sizes=(128, 256, 512, 1024))
    for r in study["results"]:
        print(f"n={r['n']:6d}: {r['wall_ms']:8.2f} ms")
    fit = study["fit"]
    print(f"fitted exponent {fit['exponent']:.2f} ({fit['classification']}), "
          f"r^2={fit['r_squared']:.3f}")


if __name__ == "__main__":
    main()
