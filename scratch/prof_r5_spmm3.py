"""SpMM formulations, device-span timing (RPC-免)."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from scratch.prof_r5_span import device_span_ms

n, B = 100_000, 128
A = slt.generate("random-sparse", n, seed=7, density=1e-4)
op = A.op(batch=True)
vals, cols = op.values, op.cols
K, n_pad = vals.shape
print(f"K={K} n_pad={n_pad}")
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((n_pad, B)) * 0.01, jnp.float32)

def f_einsum(vals, cols, X):
    g = jnp.take(X, cols, axis=0)
    return jnp.einsum("kn,knb->nb", vals, g, precision=jax.lax.Precision.HIGHEST)

def f_scan(vals, cols, X):
    def step(acc, kc):
        v, c = kc
        return acc + v[:, None] * jnp.take(X, c, axis=0), None
    acc, _ = jax.lax.scan(step, jnp.zeros((n_pad, B), X.dtype), (vals, cols))
    return acc

def make_scan_g(Gk):
    Kp = -(-K // Gk) * Gk
    vp = jnp.pad(vals, ((0, Kp - K), (0, 0)))
    cp = jnp.pad(cols, ((0, Kp - K), (0, 0)))
    vr = vp.reshape(Kp // Gk, Gk, n_pad)
    cr = cp.reshape(Kp // Gk, Gk, n_pad)
    def f(vals_, cols_, X):
        def step(acc, kc):
            v, c = kc
            t = v[0][:, None] * jnp.take(X, c[0], axis=0)
            for i in range(1, Gk):
                t = t + v[i][:, None] * jnp.take(X, c[i], axis=0)
            return acc + t, None
        acc, _ = jax.lax.scan(step, jnp.zeros((n_pad, B), X.dtype), (vr, cr))
        return acc
    return f

def f_tree(vals, cols, X):
    terms = [vals[k][:, None] * jnp.take(X, cols[k], axis=0) for k in range(K)]
    while len(terms) > 1:
        terms = [a + b for a, b in zip(terms[::2], terms[1::2])] + ([terms[-1]] if len(terms) % 2 else [])
    return terms[0]

R = 10
def bench(f, name):
    @jax.jit
    def run(vals, cols, X):
        def body(i, x):
            return f(vals, cols, x * (1.0 + 1e-9 * i)) * 0.05
        return jax.lax.fori_loop(0, R, body, X)
    ms = device_span_ms(run, vals, cols, X, tag=name)
    print(f"{name:>10}: {ms/R:6.2f} ms/SpMM (device span {ms:.1f} ms / {R})")

for f, nm in ((f_einsum, "einsum"), (f_scan, "scan"), (make_scan_g(3), "scan-g3"),
              (make_scan_g(7), "scan-g7"), (make_scan_g(9), "scan-g9"),
              (f_tree, "tree")):
    bench(f, nm)
