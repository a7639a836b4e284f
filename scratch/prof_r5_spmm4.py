"""Measure bf16 einsum SpMM and slot-trimmed (K-cap + COO tail) SpMM."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from sublinear_tpu.ops import spmv
from scratch.prof_r5_span import device_span_ms

n, B = 100_000, 128
A = slt.generate("random-sparse", n, seed=7, density=1e-4)
op = A.op(batch=True)
vals, cols = np.asarray(op.values), np.asarray(op.cols)
K, n_pad = vals.shape
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((n_pad, B)) * 0.01, jnp.float32)

# slot-trim: keep first KT slots; excess entries -> sorted COO tail
def trim(KT):
    keep_v, keep_c = vals[:KT], cols[:KT]
    tv, tr_, tc = [], [], []
    ex_v, ex_c = vals[KT:], cols[KT:]
    nz = np.nonzero(ex_v)
    tr_ = nz[1].astype(np.int32)
    tv = ex_v[nz].astype(np.float32)
    tc = ex_c[nz].astype(np.int32)
    o = np.argsort(tr_, kind="stable")
    print(f"  KT={KT}: tail={len(tv)} ({len(tv)/(vals!=0).sum()*100:.1f}% of nnz)")
    return (jnp.asarray(keep_v), jnp.asarray(keep_c), jnp.asarray(tv[o]),
            jnp.asarray(tr_[o]), jnp.asarray(tc[o]))

R = 10
def bench(f, args, name):
    @jax.jit
    def run(X, *a):
        def body(i, x):
            return f(x * (1.0 + 1e-9 * i), *a) * 0.05
        return jax.lax.fori_loop(0, R, body, X)
    ms = device_span_ms(run, X, *args, tag=name)
    print(f"{name:>12}: {ms/R:6.2f} ms/SpMM")

def f_f32(X, v, c):
    g = jnp.take(X, c, axis=0)
    return jnp.einsum("kn,knb->nb", v, g, precision=jax.lax.Precision.HIGHEST)

def f_bf16(X, v16, c):
    g = jnp.take(X.astype(jnp.bfloat16), c, axis=0)
    return jnp.einsum("kn,knb->nb", v16, g,
                      preferred_element_type=jnp.float32).astype(jnp.float32)

def f_trim(X, v, c, tv, tr_, tc):
    y = f_f32(X, v, c)
    prod = tv[:, None] * jnp.take(X, tc, axis=0)
    return y + jax.ops.segment_sum(prod, tr_, num_segments=n_pad,
                                   indices_are_sorted=True)

bench(f_f32, (jnp.asarray(vals), jnp.asarray(cols)), "f32-K27")
bench(f_bf16, (jnp.asarray(vals).astype(jnp.bfloat16), jnp.asarray(cols)), "bf16-K27")
for KT in (16, 12):
    kv, kc, tv, tr_, tc = trim(KT)
    bench(f_trim, (kv, kc, tv, tr_, tc), f"f32-K{KT}+tail")
    bench(f_bf16, (kv.astype(jnp.bfloat16), kc), f"bf16-K{KT}")
