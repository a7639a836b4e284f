"""Round-2 probes with real dependence chains (no loop-invariant hoisting)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend())


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


LOOP = 50


def dep_table(table, acc):
    # force table to depend on acc with one cheap vector op
    return table + acc[0:1, 0:1] * 1e-30


# P1: taa (S,128) lane-gather throughput, table depends on loop
def probe_taa(S, W=128):
    def kern(table_ref, idx_ref, out_ref):
        def body(i, acc):
            t = dep_table(table_ref[:], acc)
            g = jnp.take_along_axis(t, idx_ref[:, :128] if W != 128 else idx_ref[:], axis=-1)
            return acc + g[:, :128] * 1e-20 if W != 128 else acc + g * 1e-20
        out_ref[:] = jax.lax.fori_loop(0, LOOP, body, jnp.zeros((S, 128), jnp.float32))

    table = jnp.asarray(np.random.randn(S, W).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, W, (S, 128)).astype(np.int32))
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        t = timeit(f, table, idx)
        n = S * 128 * LOOP
        print(f"P1 taa S={S} W={W}: {t/LOOP*1e6:.2f} us/gather of {S*128} -> {t*1e9/n:.4f} ns/elem")
    except Exception as e:
        print(f"P1 taa S={S} W={W} FAILED:", str(e)[:200])


# P2: wide-table taa
def probe_taa_wide(W):
    S = 64
    def kern(table_ref, idx_ref, out_ref):
        def body(i, acc):
            t = dep_table(table_ref[:], acc)
            g = jnp.take_along_axis(t, idx_ref[:], axis=-1)
            return acc + g * 1e-20
        out_ref[:] = jax.lax.fori_loop(0, LOOP, body, jnp.zeros((S, W), jnp.float32))

    table = jnp.asarray(np.random.randn(S, W).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, W, (S, W)).astype(np.int32))
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        t = timeit(f, table, idx)
        n = S * W * LOOP
        print(f"P2 taa wide W={W}: {t/LOOP*1e6:.2f} us/gather of {S*W} -> {t*1e9/n:.4f} ns/elem")
    except Exception as e:
        print(f"P2 taa wide W={W} FAILED:", str(e)[:150])


# P3: sublane gather full error
def probe_sublane():
    N, S = 1024, 512
    def kern(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)
    table = jnp.asarray(np.random.randn(N, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, N, (S, 128)).astype(np.int32))
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        t = timeit(f, table, idx)
        print(f"P3 sublane gather: {t*1e6:.2f} us ({t*1e9/(S*128):.3f} ns/elem single-shot)")
    except Exception as e:
        print("P3 sublane gather FAILED:", str(e)[:500])


# P4: XLA gathers with dependence
def probe_xla(n=100_000, nnz=1_000_000, sort=False, wide=0):
    x = jnp.asarray(np.random.randn(n).astype(np.float32))
    idxn = np.random.randint(0, n, nnz)
    if sort:
        idxn = np.sort(idxn)
    idx = jnp.asarray(idxn.astype(np.int32))

    if wide:
        x8 = jnp.asarray(np.random.randn(n // wide, wide).astype(np.float32))
        idxw = jnp.asarray((idxn % (n // wide)).astype(np.int32))

        @jax.jit
        def f(x8, idxw):
            def body(i, carry):
                x8c, acc = carry
                g = jnp.take(x8c, idxw, axis=0, indices_are_sorted=sort)
                return (x8c + acc * 1e-30, acc + jnp.sum(g[:, 0]) * 1e-20)
            _, acc = jax.lax.fori_loop(0, 10, body, (x8, jnp.float32(0)))
            return acc
        t = timeit(f, x8, idxw, iters=5)
        print(f"P4 XLA wide{wide} gather sorted={sort}: {t*1e9/10/nnz:.3f} ns/row ({t/10*1e3:.2f} ms)")
        return

    @jax.jit
    def f(x, idx):
        def body(i, carry):
            xc, acc = carry
            g = jnp.take(xc, idx, indices_are_sorted=sort)
            return (xc + acc * 1e-30, acc + jnp.sum(g) * 1e-20)
        _, acc = jax.lax.fori_loop(0, 10, body, (x, jnp.float32(0)))
        return acc
    t = timeit(f, x, idx, iters=5)
    print(f"P4 XLA elem gather sorted={sort}: {t*1e9/10/nnz:.3f} ns/elem ({t/10*1e3:.2f} ms)")


# P5: XLA segment_sum
def probe_segsum(n=100_000, nnz=1_000_000):
    rows = jnp.asarray(np.sort(np.random.randint(0, n, nnz)).astype(np.int32))
    p = jnp.asarray(np.random.randn(nnz).astype(np.float32))

    @jax.jit
    def f(p, rows):
        def body(i, carry):
            pc, acc = carry
            y = jax.ops.segment_sum(pc, rows, num_segments=n, indices_are_sorted=True)
            return (pc + acc[0] * 1e-30, acc + y[:1] * 1e-20)
        _, acc = jax.lax.fori_loop(0, 10, body, (p, jnp.zeros(1, jnp.float32)))
        return acc
    t = timeit(f, p, rows, iters=5)
    print(f"P5 XLA segment_sum sorted: {t*1e9/10/nnz:.3f} ns/elem ({t/10*1e3:.2f} ms)")


# P6: VPU compare+select chain throughput
def probe_vpu():
    S = 512
    def kern(a_ref, i_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
        def body(i, acc):
            m = iota == (i_ref[:] + i)
            v = jnp.where(m, a_ref[:] + acc[0:1, 0:1] * 1e-30, 0.0)
            return acc + v * 1e-20
        out_ref[:] = jax.lax.fori_loop(0, LOOP, body, jnp.zeros((S, 128), jnp.float32))
    a = jnp.asarray(np.random.randn(S, 128).astype(np.float32))
    ii = jnp.asarray(np.random.randint(0, S, (S, 128)).astype(np.int32))
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    t = timeit(f, a, ii)
    n = S * 128 * LOOP * 3  # ~3 vec ops per elem per iter (cmp, select, add)
    print(f"P6 VPU cmp+sel+add chain: {n/t/1e12:.2f} Tops/s  ({t/LOOP*1e6:.2f} us/iter of {S*128*3} ops)")


# P7: MXU B=1 scatter shapes
def probe_mxu_b1(M, K):
    a = jnp.asarray(np.random.randn(M, K), jnp.bfloat16)
    b = jnp.asarray(np.random.randn(K, 1), jnp.bfloat16)
    @jax.jit
    def f(a, b):
        def body(i, acc):
            return acc + jnp.dot(a + acc[0, 0] * 1e-30, b, preferred_element_type=jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, LOOP, body, jnp.zeros((M, 1), jnp.float32))
    t = timeit(f, a, b)
    print(f"P7 MXU ({M},{K})@({K},1): {t/LOOP*1e6:.2f} us/mm -> {t/LOOP/K*1e9:.2f} ns/entry-if-scatter")


# P8: in-kernel cumsum along sublanes
def probe_cumsum(S=2048):
    def kern(a_ref, out_ref):
        def body(i, acc):
            c = jnp.cumsum(a_ref[:] + acc[0:1, 0:1] * 1e-30, axis=0)
            return acc + c * 1e-20
        out_ref[:] = jax.lax.fori_loop(0, 10, body, jnp.zeros((S, 128), jnp.float32))
    a = jnp.asarray(np.random.randn(S, 128).astype(np.float32))
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        t = timeit(f, a, iters=10)
        print(f"P8 cumsum (S={S},128) axis0: {t/10*1e6:.2f} us -> {t*1e9/10/(S*128):.4f} ns/elem")
    except Exception as e:
        print("P8 FAILED:", str(e)[:200])


if __name__ == "__main__":
    probe_xla(sort=False)
    probe_xla(sort=True)
    probe_xla(wide=8, sort=False)
    probe_segsum()
    probe_taa(8)
    probe_taa(64)
    probe_taa(512)
    for W in (256, 512, 1024, 8192):
        probe_taa_wide(W)
    probe_sublane()
    probe_vpu()
    probe_mxu_b1(128, 512)
    probe_mxu_b1(128, 1024)
    probe_mxu_b1(1024, 1024)
    probe_cumsum()
