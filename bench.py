"""Headline benchmark (BASELINE config #1): solve the generated 1000x1000
sparse diagonally-dominant system to 1e-6 relative residual.

Prints ONE JSON line:
  {"metric": "solve_dd_1000x1000_ms", "value": <ms/solve>, "unit": "ms",
   "vs_baseline": <reference_ms / ours_ms>}

vs_baseline compares against the reference's best published number for this
config (Rust-WASM 0.63 ms, /root/reference/README.md:357-359); > 1.0 means we
are faster than the reference.

Timing protocol (the dev tunnel requires care):
  - REPS independent solves (RHS varied per repetition so nothing can be
    cached/CSE'd) run inside ONE jitted lax.scan;
  - synchronization is a host fetch of a scalar that depends on every solve
    (block_until_ready does NOT guarantee completion through the tunnel);
  - the measured wall subtracts the round-trip floor (timed on a trivial
    program) and divides by REPS.
Extra diagnostics go to stderr; stdout is the single JSON line.
"""
import json
import sys
import time

import numpy as np

N = 1000
DENSITY = 0.001
EPSILON = 1e-6
REPS = 256
BASELINE_MS = 0.63  # Rust-WASM, reference README.md:359


def main():
    import jax
    import jax.numpy as jnp

    import sublinear_tpu as slt
    from sublinear_tpu.solvers import base as sbase

    t_setup = time.perf_counter()
    A = slt.generate("random-sparse", N, seed=7, density=DENSITY)
    b = slt.rhs(N, seed=7)
    op = A.op()
    b_pad = A.pad_vector(b)
    threshold = sbase.threshold_for(b, slt.SolverOptions(epsilon=EPSILON))
    print(f"setup {1e3 * (time.perf_counter() - t_setup):.0f}ms nnz={A.nnz}", file=sys.stderr)

    scales_np = np.linspace(0.5, 2.0, REPS)
    scales = jnp.asarray(scales_np, op.dtype)

    # Fixed-iteration Neumann series (ITERS chosen with margin over the ~10
    # this system needs), vmapped over all REPS right-hand sides: the whole
    # benchmark is one batched-matmul program — trivial to compile (scans of
    # while_loops take minutes on the remote-compile service) — and the
    # correctness gate below still verifies every repetition reached the
    # 1e-6 threshold.
    ITERS = 16

    @jax.jit
    def run_many(op, b_pad, scales):
        inv_d = op.inv_diag

        def one(scale):
            bs = b_pad * scale
            term0 = inv_d * bs

            def step(_, st):
                x, term = st
                term = -inv_d * op.offdiag_matvec(term)
                return x + term, term

            x, _ = jax.lax.fori_loop(0, ITERS, step, (term0, term0))
            res = jnp.linalg.norm(op.matvec(x) - bs)
            return x[0], res

        probes, ress = jax.vmap(one)(scales)
        ks = jnp.full(scales.shape, ITERS, jnp.int32)
        return jnp.sum(probes), ks, ress

    @jax.jit
    def trivial(x):
        return x[0] + 1.0

    def sync_run(fn, *args):
        """Execute and block on a real host fetch of a dependent scalar."""
        out = fn(*args)
        float(np.asarray(jax.device_get(out[0] if isinstance(out, tuple) else out)))
        return out

    # compile + warmup
    t0 = time.perf_counter()
    out = sync_run(run_many, op, b_pad, scales)
    print(f"compile+first {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # round-trip floor
    float(trivial(b_pad))
    floors = []
    for rep in range(5):
        t0 = time.perf_counter()
        float(trivial(b_pad * (1.0 + 0.001 * rep)))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)
    print(f"rpc floor {floor * 1e3:.2f}ms", file=sys.stderr)

    times = []
    for rep in range(3):
        sc = scales * (1.0 + 0.01 * (rep + 1))
        t0 = time.perf_counter()
        out = sync_run(run_many, op, b_pad, sc)
        times.append(max(time.perf_counter() - t0 - floor, 1e-9) / REPS * 1e3)
    per_solve_ms = min(times)

    _, ks, ress = out
    ks = np.asarray(jax.device_get(ks))
    ress = np.asarray(jax.device_get(ress))
    # correctness gate: every repetition must actually converge
    # (margin covers the per-run input perturbation above)
    ok = bool(np.all(ress <= np.asarray(threshold) * scales_np * 1.05))
    print(
        f"iters={ks.min()}..{ks.max()} max_res={ress.max():.2e} converged={ok} "
        f"per_solve={per_solve_ms:.4f}ms (runs: {[f'{t:.4f}' for t in times]})",
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
