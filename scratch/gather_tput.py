"""Measure pure tpu.dynamic_gather throughput via in-kernel repetition chains."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

S = 2048   # sublanes (table rows); total elems per gather = S*128 = 262144


def make_kern(reps):
    def kern(tbl_ref, idx_ref, o_ref):
        tbl = tbl_ref[:]
        idx = idx_ref[:]
        acc = jnp.zeros_like(tbl)
        def body(i, carry):
            acc, idx = carry
            g = jnp.take_along_axis(tbl, idx, axis=1)
            acc = acc + g
            idx = jnp.bitwise_and(idx + 1, 127)  # cheap dependency-free shuffle
            return acc, idx
        acc, idx = jax.lax.fori_loop(0, reps, body, (acc, idx))
        o_ref[:] = acc
    return kern


def run(reps):
    f = pl.pallas_call(
        make_kern(reps),
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(f)

tbl = jnp.asarray(np.random.randn(S, 128).astype(np.float32))
idx = jnp.asarray(np.random.randint(0, 128, (S, 128)).astype(np.int32))

def timeit(f, *a, n=30):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/n

f1 = run(1); f33 = run(33)
t1 = timeit(f1, tbl, idx)
t33 = timeit(f33, tbl, idx)
marginal = (t33 - t1) / 32          # per extra gather pass over S*128 elems
per_elem = marginal / (S*128)
print(f"t1={t1*1e6:.1f}us t33={t33*1e6:.1f}us marginal/pass={marginal*1e6:.2f}us per_elem={per_elem*1e9:.3f}ns rate={1/per_elem/1e9:.2f} G/s")

# also measure an fma-only loop for comparison (same loop structure, no gather)
def make_fma(reps):
    def kern(tbl_ref, idx_ref, o_ref):
        tbl = tbl_ref[:]
        x = idx_ref[:].astype(jnp.float32)
        acc = jnp.zeros_like(tbl)
        def body(i, carry):
            acc, x = carry
            acc = acc + tbl * x
            x = x + 1.0
            return acc, x
        acc, x = jax.lax.fori_loop(0, reps, body, (acc, x))
        o_ref[:] = acc
    return kern

def runf(reps):
    return jax.jit(pl.pallas_call(
        make_fma(reps),
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
g1 = runf(1); g33 = runf(33)
s1 = timeit(g1, tbl, idx); s33 = timeit(g33, tbl, idx)
m = (s33-s1)/32
print(f"fma-only marginal/pass={m*1e6:.2f}us per_elem={m/(S*128)*1e9:.3f}ns")
