"""Probe TPU gather primitives to design the sparse SpMV kernel.

Questions:
 1. Does Mosaic support in-kernel dynamic gather (lane shuffle)? Which spellings?
 2. Cost per gathered element for various table sizes.
 3. MXU matmul timing for one-hot candidate shapes.
"""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), jax.devices())


def timeit(fn, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- probe 1:
# in-kernel take_along_axis on (8,128) table, per-sublane indices
def k_taa(table_ref, idx_ref, out_ref):
    def body(i, acc):
        g = jnp.take_along_axis(table_ref[:], (idx_ref[:] + acc.astype(jnp.int32)[:1, :1]) % 128, axis=-1)
        return acc + jnp.sum(g) * 1e-20
    acc = jax.lax.fori_loop(0, 100, body, jnp.zeros((8, 128), jnp.float32))
    out_ref[:] = acc


def probe_taa():
    table = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.zeros((8, 128), jnp.int32)
    f = pl.pallas_call(
        k_taa,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    t = timeit(jax.jit(f), table, idx)
    # 100 gathers of 1024 elements per call
    print(f"take_along_axis (8,128) lane-gather: {t*1e9/100/1024:.3f} ns/elem  ({t*1e6:.1f} us/call)")


# probe 1b: bigger second-minor: table (512,128), idx (512,128) gather along lanes
def k_taa_big(table_ref, idx_ref, out_ref):
    def body(i, acc):
        g = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=-1)
        return acc + g * 1e-20
    acc = jax.lax.fori_loop(0, 100, body, jnp.zeros_like(table_ref))
    out_ref[:] = acc


def probe_taa_big(S=512):
    table = jnp.arange(S * 128, dtype=jnp.float32).reshape(S, 128)
    idx = np.random.randint(0, 128, (S, 128)).astype(np.int32)
    idx = jnp.asarray(idx)
    f = pl.pallas_call(
        k_taa_big,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    t = timeit(jax.jit(f), table, idx)
    print(f"take_along_axis ({S},128) lane-gather: {t*1e9/100/(S*128):.4f} ns/elem  ({t*1e6:.1f} us/call)")


# probe 2: gather along SUBLANE axis (table (N,128), idx over rows)
def k_row_gather(table_ref, idx_ref, out_ref):
    def body(i, acc):
        g = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)
        return acc + g * 1e-20
    acc = jax.lax.fori_loop(0, 100, body, jnp.zeros((512, 128), jnp.float32))
    out_ref[:] = acc


def probe_row_gather(N=1024):
    table = jnp.arange(N * 128, dtype=jnp.float32).reshape(N, 128)
    idx = jnp.asarray(np.random.randint(0, N, (512, 128)).astype(np.int32))
    f = pl.pallas_call(
        k_row_gather,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        t = timeit(jax.jit(f), table, idx)
        print(f"sublane-gather table ({N},128): {t*1e9/100/(512*128):.4f} ns/elem  ({t*1e6:.1f} us/call)")
    except Exception as e:
        print("sublane-gather FAILED:", str(e)[:200])


# probe 3: full 1-D style gather from a big VMEM vector via jnp.take
def k_take_1d(table_ref, idx_ref, out_ref):
    def body(i, acc):
        g = jnp.take(table_ref[:], idx_ref[:], axis=0)
        return acc + g * 1e-20
    acc = jax.lax.fori_loop(0, 10, body, jnp.zeros((512, 128), jnp.float32))
    out_ref[:] = acc


def probe_take_1d(N=100_000):
    table = jnp.arange(N, dtype=jnp.float32)
    idx = jnp.asarray(np.random.randint(0, N, (512, 128)).astype(np.int32))
    f = pl.pallas_call(
        k_take_1d,
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        t = timeit(jax.jit(f), table, idx)
        print(f"1-D take from VMEM({N}): {t*1e9/10/(512*128):.4f} ns/elem  ({t*1e6:.1f} us/call)")
    except Exception as e:
        print(f"1-D take from VMEM({N}) FAILED:", str(e)[:300])


# probe 4: MXU one-hot gather: (M,K)@(K,N) shapes for candidate tiles
def probe_mxu(M, K, N, dtype=jnp.bfloat16, iters=30):
    a = jnp.asarray(np.random.randn(M, K), dtype)
    b = jnp.asarray(np.random.randn(K, N), dtype)

    @jax.jit
    def f(a, b):
        def body(i, acc):
            return acc + jnp.dot(a + acc[0, 0] * 1e-30, b, preferred_element_type=jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, 50, body, jnp.zeros((M, N), jnp.float32))

    t = timeit(f, a, b, iters=iters)
    fl = 2 * M * K * N * 50
    print(f"MXU {dtype.__name__} ({M},{K})@({K},{N}): {t/50*1e6:.2f} us/mm, {fl/t/1e12:.1f} TFLOPS")


# probe 5: XLA baseline gathers at n=100k
def probe_xla_gather(n=100_000, nnz=1_000_000):
    x = jnp.asarray(np.random.randn(n).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, n, nnz).astype(np.int32))

    @jax.jit
    def f(x, idx):
        def body(i, acc):
            return acc + x[idx] * 1e-20
        return jax.lax.fori_loop(0, 5, body, jnp.zeros(nnz, jnp.float32))

    t = timeit(f, x, idx, iters=10)
    print(f"XLA gather n={n}, nnz={nnz}: {t*1e9/5/nnz:.3f} ns/elem ({t/5*1e3:.2f} ms/gather)")


if __name__ == "__main__":
    probe_xla_gather()
    for fn in (probe_taa, probe_taa_big, probe_row_gather, probe_take_1d):
        try:
            fn()
        except Exception as e:
            print(fn.__name__, "FAILED:", str(e)[:300])
    probe_take_1d(8192)
    probe_mxu(128, 512, 128)
    probe_mxu(512, 128, 128)
    probe_mxu(1024, 512, 128)
    probe_mxu(512, 1024, 8)
    probe_mxu(8, 1024, 512)
