"""Compare batched ELL SpMM formulations on-device (n=100k, B=128)."""
import glob, gzip, json, os, sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt

n, B = 100_000, 128
A = slt.generate("random-sparse", n, seed=7, density=1e-4)
op = A.op(batch=True)
vals, cols = op.values, op.cols          # (K, n_pad)
K, n_pad = vals.shape
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((op.n_pad, B)), jnp.float32)
print(f"K={K} n_pad={n_pad}")

def f_einsum(vals, cols, X):
    g = jnp.take(X, cols, axis=0)
    return jnp.einsum("kn,knb->nb", vals, g, precision=jax.lax.Precision.HIGHEST)

def f_mulsum(vals, cols, X):
    g = jnp.take(X, cols, axis=0)
    return jnp.sum(vals[:, :, None] * g, axis=0)

def f_scan(vals, cols, X):
    def step(acc, kc):
        v, c = kc
        return acc + v[:, None] * jnp.take(X, c, axis=0), None
    acc0 = jnp.zeros((X.shape[0], X.shape[1]), X.dtype)
    acc, _ = jax.lax.scan(step, acc0, (vals, cols))
    return acc

def f_bf16(vals, cols, X):
    g = jnp.take(X.astype(jnp.bfloat16), cols, axis=0)
    return jnp.sum(vals[:, :, None] * g.astype(jnp.float32), axis=0)

def f_splitk(vals, cols, X):
    # 4 slot groups, materialize (7, n, B) at a time, sum pairwise
    parts = []
    Kq = (K + 3) // 4
    for q in range(4):
        v, c = vals[q*Kq:(q+1)*Kq], cols[q*Kq:(q+1)*Kq]
        g = jnp.take(X, c, axis=0)
        parts.append(jnp.sum(v[:, :, None] * g, axis=0))
    return parts[0] + parts[1] + parts[2] + parts[3]

R = 8
def bench(f, name):
    @jax.jit
    def chain(vals, cols, X):
        def body(i, x):
            y = f(vals, cols, x * (1.0 + 1e-9 * i))
            return y * 1e-3  # keep magnitudes sane
        return jax.lax.fori_loop(0, R, body, X)
    y = np.asarray(jax.device_get(chain(vals, cols, X)))
    tdir = f"/tmp/r5spmm_{name}"; os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        float(np.asarray(jax.device_get(chain(vals, cols, X)))[0, 0])
    tot = 0.0
    with gzip.open(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)[0], "rt") as f2:
        tr = json.load(f2)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("name", "").startswith(("fusion", "while", "multiply", "reduce", "gather", "scan", "closed_call", "dynamic")):
            nm = ev.get("name", "")
            if nm.startswith("while"):
                tot = ev.get("dur", 0)  # whole loop
    print(f"{name:>8}: {tot/1e3/R:6.2f} ms/SpMM")

for f, name in ((f_einsum, "einsum"), (f_mulsum, "mulsum"), (f_scan, "scan"),
                (f_splitk, "splitk"), (f_bf16, "bf16")):
    try:
        bench(f, name)
    except Exception as e:
        print(f"{name:>8}: FAIL {str(e)[:120]}")
