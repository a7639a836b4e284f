"""Headline benchmark (BASELINE config #1): solve the generated 1000x1000
sparse diagonally-dominant system to 1e-6 relative residual.

Prints ONE JSON line:
  {"metric": "solve_dd_1000x1000_ms", "value": <ms/solve>, "unit": "ms",
   "vs_baseline": <reference_ms / ours_ms>}

vs_baseline compares against the reference's best published number for this
config (Rust-WASM 0.63 ms, /root/reference/README.md:357-359); > 1.0 means we
are faster than the reference.

Measurement method: REPS independent solves (RHS varied per repetition so XLA
cannot CSE them) run inside ONE jitted lax.scan; wall time of that program
divided by REPS is the per-solve device time.  This excludes the per-dispatch
RPC overhead of the development tunnel (~100 ms/dispatch), which is a harness
artifact, not solver time; the scan program itself is exactly REPS full
back-to-back solves on device.  Extra diagnostics go to stderr; stdout is the
single JSON line.
"""
import json
import sys
import time

import numpy as np

N = 1000
DENSITY = 0.001
EPSILON = 1e-6
REPS = 32
BASELINE_MS = 0.63  # Rust-WASM, reference README.md:359


def main():
    import jax
    import jax.numpy as jnp

    import sublinear_tpu as slt
    from sublinear_tpu.solvers import base as sbase
    from sublinear_tpu.solvers.neumann import _neumann_run

    t_setup = time.perf_counter()
    A = slt.generate("random-sparse", N, seed=7, density=DENSITY)
    b = slt.rhs(N, seed=7)
    op = A.op()
    b_pad = A.pad_vector(b)
    threshold = sbase.threshold_for(b, slt.SolverOptions(epsilon=EPSILON))
    print(f"setup {1e3 * (time.perf_counter() - t_setup):.0f}ms nnz={A.nnz}", file=sys.stderr)

    scales = jnp.linspace(0.5, 2.0, REPS).astype(op.dtype)

    @jax.jit
    def run_many(op, b_pad, scales):
        def one(carry, scale):
            x, k, res = _neumann_run(
                op, b_pad * scale, jnp.zeros_like(b_pad), threshold * scale, jnp.int32(1000), 5
            )
            return carry, (k, res, x[0])

        _, (ks, ress, probes) = jax.lax.scan(one, 0, scales)
        return ks, ress, probes

    # compile + warmup
    t0 = time.perf_counter()
    out = run_many(op, b_pad, scales)
    jax.block_until_ready(out)
    print(f"compile+first {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times = []
    for rep in range(3):
        # unique inputs per run: the dev tunnel may cache identical executions
        sc = scales * (1.0 + 0.01 * (rep + 1))
        t0 = time.perf_counter()
        out = run_many(op, b_pad, sc)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / REPS * 1e3)
    per_solve_ms = min(times)

    ks, ress, _ = out
    ks = np.asarray(ks)
    ress = np.asarray(ress)
    # correctness gate: every repetition must actually converge
    # margin covers the per-run 1% input perturbation above
    ok = bool(np.all(ress <= np.asarray(threshold) * np.linspace(0.5, 2.0, REPS) * 1.05))
    print(
        f"iters={ks.min()}..{ks.max()} max_res={ress.max():.2e} converged={ok} "
        f"per_solve={per_solve_ms:.3f}ms (runs: {[f'{t:.3f}' for t in times]})",
        file=sys.stderr,
    )
    if not ok:
        per_solve_ms = float("inf")

    print(
        json.dumps(
            {
                "metric": "solve_dd_1000x1000_ms",
                "value": round(per_solve_ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / per_solve_ms, 3) if per_solve_ms > 0 else 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
