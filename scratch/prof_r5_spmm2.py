"""SpMM formulations, honest chain-differenced wall timing."""
import sys, time
from functools import reduce
import operator
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt

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

def bench(f, name, R=10):
    def chain(Rn):
        @jax.jit
        def run(vals, cols, X):
            def body(i, x):
                return f(vals, cols, x * (1.0 + 1e-9 * i)) * 0.05
            return jax.lax.fori_loop(0, Rn, body, X)
        return run
    f2, f10 = chain(2), chain(2 + R)
    float(np.asarray(jax.device_get(f2(vals, cols, X)))[0, 0])
    float(np.asarray(jax.device_get(f10(vals, cols, X)))[0, 0])
    t2, t10 = [], []
    for i in range(4):
        t0 = time.perf_counter(); float(np.asarray(jax.device_get(f2(vals, cols, X * (1 + 1e-6 * i))))[0, 0]); t2.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(np.asarray(jax.device_get(f10(vals, cols, X * (1 + 1e-6 * i))))[0, 0]); t10.append(time.perf_counter() - t0)
    per = (min(t10) - min(t2)) / R * 1e3
    print(f"{name:>10}: {per:6.2f} ms/SpMM")

bench(f_einsum, "einsum")
bench(f_scan, "scan")
bench(make_scan_g(3), "scan-g3")
bench(make_scan_g(7), "scan-g7")
bench(make_scan_g(14), "scan-g14")
bench(f_tree, "tree")
