"""Round-robin variant comparison: compile all, then cycle measurements so
clock drift hits every variant equally. Reports per-variant median slope."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from scratch.prof_r5_p2var import make_call, ITERS


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else ["base", "p2c", "p2all"]
    cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    r_short, r_long = 8, 48
    A = slt.generate("random-sparse", n, seed=7, density=1e-4)
    op = A.op()
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.standard_normal((op.C_src, 128)), jnp.float32)

    runs = {}
    for v in variants:
        call = make_call(op, v, ITERS)
        def make(R, call=call):
            @jax.jit
            def run(op_, t):
                inv2d = op_.inv_diag.reshape(op_.C_src, 128)
                def body(i, vv):
                    acc, term = call(vv * (1.0 + 1e-9 * i), inv2d,
                                     op_.idx_src, op_.val_src, op_.idx2, op_.idx3)
                    return acc
                return jax.lax.fori_loop(0, R, body, t)
            return run
        runs[v] = (make(r_short), make(r_long))
        # warm both compiles
        float(np.asarray(jax.device_get(runs[v][0](op, t0)))[0, 0])
        float(np.asarray(jax.device_get(runs[v][1](op, t0)))[0, 0])

    slopes = {v: [] for v in variants}
    for c in range(cycles):
        for v in variants:
            fs, fl = runs[v]
            t0h = time.perf_counter()
            float(np.asarray(jax.device_get(fs(op, t0 * (1 + 1e-6 * c))))[0, 0])
            ts = time.perf_counter() - t0h
            t0h = time.perf_counter()
            float(np.asarray(jax.device_get(fl(op, t0 * (1 + 1e-6 * c))))[0, 0])
            tl = time.perf_counter() - t0h
            slopes[v].append((tl - ts) / (r_long - r_short) / ITERS * 1e6)
    for v in variants:
        s = np.array(slopes[v])
        print(f"{v:>6}: median {np.median(s):7.1f} us/iter  min {s.min():7.1f}  all {np.round(s,1)}")


if __name__ == "__main__":
    main()
