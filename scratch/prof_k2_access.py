"""Isolate kernel-2's slab-access cost: strided middle-dim extraction vs
contiguous 8-slab load + in-VMEM transpose.  Run on the real chip."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

Bs, Bd = 120, 208


def timeit(f, *args, reps=200, inner=None):
    y = jax.block_until_ready(f(*args))
    # sync through a host fetch of a scalar dependent on the result
    float(np.asarray(y).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    float(np.asarray(y).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e6


def run_chain(make_call, o2t, reps_long=256, reps_short=32):
    """Chain kernel calls y->scale o2t to measure steady-state per-call us."""
    call = make_call()

    def chain(R):
        @jax.jit
        def f(o):
            def body(i, carry):
                o_c, acc = carry
                y = call(o_c)
                return o_c * (1.0 + 1e-12 * jnp.sum(y[0, :1])), acc + y[0, 0]
            o_f, acc = jax.lax.fori_loop(0, R, body, (o, jnp.float32(0)))
            return acc + o_f[0, 0, 0]
        return f
    fs, fl = chain(reps_short), chain(reps_long)
    float(np.asarray(fs(o2t)))
    float(np.asarray(fl(o2t)))
    ts, tl = [], []
    for i in range(3):
        t0 = time.perf_counter(); float(np.asarray(fs(o2t))); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(np.asarray(fl(o2t))); tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (reps_long - reps_short) * 1e6


def strided_call():
    """Current access: per-db middle-dim slice."""
    G2 = 16

    def kernel(o_ref, y_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
        for i in range(G2):
            m = o_ref[:, i, :]                    # (Bs, 128) strided
            y_ref[(i % 8) * 128:(i % 8) * 128 + 128, :] += m.T.sum(axis=1)[:, None] + jnp.zeros((128, 128), jnp.float32)

    return pl.pallas_call(
        kernel, grid=(Bd // G2,),
        in_specs=[pl.BlockSpec((Bs, G2, 128), lambda s: (0, s, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8 * 128, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
    )


def strided_gather_call():
    """Current FULL phase-2 chain: strided slice + roll + T + concat + gather."""
    G2 = 16
    i3 = jnp.asarray(np.random.default_rng(0).integers(0, 128, (Bd * 128, 128)), jnp.int8)

    def kernel(o_ref, i3_ref, y_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
        for i in range(G2):
            db = G2 * pl.program_id(0) + i
            k = db // 8
            s_k = (k * 37) % 128
            m = o_ref[:, i, :]
            mp = pltpu.roll(m, -s_k, 1)
            mt = mp.T
            mt = jnp.concatenate([mt, jnp.zeros((128, 128 - Bs), jnp.float32)], axis=1)
            idx = i3_ref[i * 128:(i + 1) * 128, :].astype(jnp.int32)
            o3 = jnp.take_along_axis(mt, idx, axis=1)
            y_ref[(i % 8) * 128:(i % 8) * 128 + 128, :] += o3

    call = pl.pallas_call(
        kernel, grid=(Bd // G2,),
        in_specs=[
            pl.BlockSpec((Bs, G2, 128), lambda s: (0, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G2 * 128, 128), lambda s: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8 * 128, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
    )
    return lambda o: call(o, i3)


def contig_transpose_call():
    """Alternative: contiguous (Bs,8,128) load, transpose(1,0,2), then slabs."""
    G2 = 16
    i3 = jnp.asarray(np.random.default_rng(0).integers(0, 128, (Bd * 128, 128)), jnp.int8)

    def kernel(o_ref, i3_ref, y_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
        for half in range(G2 // 8):
            blk = o_ref[:, half * 8:(half + 1) * 8, :]     # (Bs, 8, 128) contiguous
            perm = jnp.transpose(blk, (1, 0, 2))           # (8, Bs, 128)
            for j in range(8):
                i = half * 8 + j
                db = G2 * pl.program_id(0) + i
                k = db // 8
                s_k = (k * 37) % 128
                m = perm[j]
                mp = pltpu.roll(m, -s_k, 1)
                mt = mp.T
                mt = jnp.concatenate([mt, jnp.zeros((128, 128 - Bs), jnp.float32)], axis=1)
                idx = i3_ref[i * 128:(i + 1) * 128, :].astype(jnp.int32)
                o3 = jnp.take_along_axis(mt, idx, axis=1)
                y_ref[(i % 8) * 128:(i % 8) * 128 + 128, :] += o3

    call = pl.pallas_call(
        kernel, grid=(Bd // G2,),
        in_specs=[
            pl.BlockSpec((Bs, G2, 128), lambda s: (0, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G2 * 128, 128), lambda s: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8 * 128, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
    )
    return lambda o: call(o, i3)


def contig_bigT_call():
    """Alternative 2: one (Bs*8,128) -> transpose to (128, Bs*8)?  Not lane-
    feasible; instead transpose each (Bs,128) AFTER a (8,Bs,128) permute is
    what variant above does.  Here: skip roll/gather to isolate pure access:
    contiguous load + transpose(1,0,2) only."""
    G2 = 16

    def kernel(o_ref, y_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
        for half in range(G2 // 8):
            blk = o_ref[:, half * 8:(half + 1) * 8, :]
            perm = jnp.transpose(blk, (1, 0, 2))
            for j in range(8):
                y_ref[(j % 8) * 128:(j % 8) * 128 + 128, :] += perm[j].T.sum(axis=1)[:, None] + jnp.zeros((128, 128), jnp.float32)

    return pl.pallas_call(
        kernel, grid=(Bd // G2,),
        in_specs=[pl.BlockSpec((Bs, G2, 128), lambda s: (0, s, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8 * 128, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    o2t = jnp.asarray(rng.standard_normal((Bs, Bd, 128)), jnp.float32)
    for name, mk in [("strided-sum", strided_call),
                     ("contig-T-sum", contig_bigT_call),
                     ("strided-full-k2", strided_gather_call),
                     ("contig-T-full-k2", contig_transpose_call)]:
        t0 = time.time()
        us = run_chain(mk, o2t)
        print(f"{name:>18}: {us:7.1f} us/call   (compile+meas {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
