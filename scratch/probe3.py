"""Round-3 probes: lane-only broadcasts for dependence, differencing for XLA."""
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


LOOP = 100


# P1: taa lane-gather, idx depends on acc via lane-broadcast
def probe_taa(S, W=128):
    def kern(table_ref, idx_ref, out_ref):
        def body(i, acc):
            dep = (acc[:, 0:1] * 1e-30).astype(jnp.int32)  # (S,1) -> lanes bcast
            idx2 = (idx_ref[:] + dep) % W
            g = jnp.take_along_axis(table_ref[:], idx2, axis=-1)
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
        print(f"P1 taa S={S} W={W}: {t/LOOP*1e6:.3f} us/iter ({S*W} elems + idx prep) -> {t*1e9/n:.4f} ns/elem")
    except Exception as e:
        print(f"P1 taa S={S} W={W} FAILED:", str(e)[:160])


# P1b: baseline loop WITHOUT the gather (same idx prep) to difference out prep cost
def probe_taa_base(S, W=128):
    def kern(table_ref, idx_ref, out_ref):
        def body(i, acc):
            dep = (acc[:, 0:1] * 1e-30).astype(jnp.int32)
            idx2 = (idx_ref[:] + dep) % W
            return acc + idx2.astype(jnp.float32) * 1e-20
        out_ref[:] = jax.lax.fori_loop(0, LOOP, body, jnp.zeros((S, W), jnp.float32))

    table = jnp.asarray(np.random.randn(S, W).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, W, (S, W)).astype(np.int32))
    f = jax.jit(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    t = timeit(f, table, idx)
    print(f"P1b base S={S} W={W}: {t/LOOP*1e6:.3f} us/iter (no gather)")


# P3: sublane gather (axis=0)
def probe_sublane(N=1024, S=512):
    def kern(table_ref, idx_ref, out_ref):
        def body(i, acc):
            dep = (acc[:, 0:1] * 1e-30).astype(jnp.int32)
            idx2 = (idx_ref[:] + dep) % N
            g = jnp.take_along_axis(table_ref[:], idx2, axis=0)
            return acc + g * 1e-20
        out_ref[:] = jax.lax.fori_loop(0, LOOP, body, jnp.zeros((S, 128), jnp.float32))
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
        print(f"P3 sublane gather N={N}: {t/LOOP*1e6:.3f} us/iter -> {t*1e9/(LOOP*S*128):.4f} ns/elem")
    except Exception as e:
        print(f"P3 sublane gather FAILED:", str(e)[:300])


# P6: VPU compare+select chain
def probe_vpu(S=512):
    def kern(a_ref, i_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
        def body(i, acc):
            m = iota == (i_ref[:] + i)
            v = jnp.where(m, a_ref[:] + acc * 1e-30, 0.0)
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
    nops = S * 128 * LOOP * 5  # cmp, add(bcast of i), mul, where, add
    print(f"P6 VPU chain: {nops/t/1e12:.2f} Tops/s ({t/LOOP*1e6:.3f} us/iter)")


# P4: XLA gather with idx dependence (differencing)
def probe_xla(n=100_000, nnz=1_000_000, sort=False, with_gather=True):
    x = jnp.asarray(np.random.randn(n).astype(np.float32))
    idxn = np.random.randint(0, n - 2, nnz)
    if sort:
        idxn = np.sort(idxn)
    idx = jnp.asarray(idxn.astype(np.int32))

    @jax.jit
    def f(x, idx):
        def body(i, acc):
            idx2 = idx + (acc.astype(jnp.int32) & 1)  # scalar bcast -> vector add
            if with_gather:
                g = jnp.take(x, idx2, indices_are_sorted=sort)
                return acc + g[0] * 1e-20
            return acc + idx2[0].astype(jnp.float32) * 1e-20
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))
    t = timeit(f, x, idx, iters=5)
    tag = "gather" if with_gather else "nogather"
    print(f"P4 XLA {tag} sorted={sort}: {t/10*1e3:.3f} ms/iter")
    return t / 10


# P5: segment_sum with dependence
def probe_segsum(n=100_000, nnz=1_000_000, with_op=True):
    rows = jnp.asarray(np.sort(np.random.randint(0, n, nnz)).astype(np.int32))
    p = jnp.asarray(np.random.randn(nnz).astype(np.float32))

    @jax.jit
    def f(p, rows):
        def body(i, acc):
            p2 = p * (1.0 + acc * 1e-30)  # full-vector dep
            if with_op:
                y = jax.ops.segment_sum(p2, rows, num_segments=n, indices_are_sorted=True)
                return acc + y[0] * 1e-20
            return acc + p2[0] * 1e-20
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))
    t = timeit(f, p, rows, iters=5)
    tag = "segsum" if with_op else "base"
    print(f"P5 XLA {tag}: {t/10*1e3:.3f} ms/iter")


if __name__ == "__main__":
    tg = probe_xla(with_gather=True)
    tb = probe_xla(with_gather=False)
    print(f"  => XLA unsorted gather net: {(tg-tb)*1e9/1e6:.3f} ns/elem")
    tgs = probe_xla(sort=True, with_gather=True)
    print(f"  => XLA sorted gather net: {(tgs-tb)*1e9/1e6:.3f} ns/elem")
    probe_segsum(with_op=True)
    probe_segsum(with_op=False)
    probe_taa(8)
    probe_taa_base(8)
    probe_taa(64)
    probe_taa(512)
    probe_taa_base(512)
    probe_taa(64, W=256)
    probe_taa(64, W=512)
    probe_taa(64, W=1024)
    probe_taa(8, W=8192)
    probe_sublane()
    probe_vpu()
