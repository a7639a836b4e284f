"""Probe: async VMEM->VMEM strided slab DMA vs in-kernel strided reads.

Phase-2 of the XBAR kernel reads (Ms,1,128) middle-dim slabs from the o2t
scratch at ~130 ns each (partial-tile reads: 1 sublane per native (8,128)
tile).  If a DMA engine copy of the same slab into a contiguous buffer is
fast and runs async, the extract cost hides behind the per-slab compute.
Variants:
  strided_read — current access pattern (reads all Ms sublanes per slab)
  dma_sync     — per-slab DMA, start+wait back-to-back (DMA latency)
  dma_pipe     — double-buffered: start slab db+1, wait slab db, then read
                 the contiguous buffer (the real deployment shape)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
Ms, Bd, NDB = 128, 182, 182


def bench(body, reps_long=256, reps_short=32):
    call = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Ms, Bd, 128), jnp.float32),
                        pltpu.VMEM((2, Ms, 1, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=Ms * Bd * 128 * 4 + 16 * 1024 * 1024,
            has_side_effects=True))

    def make(R):
        @jax.jit
        def run(a):
            return jax.lax.fori_loop(0, R, lambda i, v: call(v) * (1.0 + 1e-12 * i), a)
        return run
    a = jnp.asarray(np.random.default_rng(0).standard_normal((128, 128)), jnp.float32)
    fs, fl = make(reps_short), make(reps_long)
    np.asarray(fs(a)); np.asarray(fl(a))
    ts, tl = [], []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fs(a)); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fl(a)); tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (reps_long - reps_short) * 1e6 / NDB * 1000


def _seed(a_ref, scr):
    scr[pl.ds(0, 8), pl.ds(0, 8), :] = jnp.broadcast_to(
        a_ref[0:8, :][:, None, :], (8, 8, 128))


def strided_read(a_ref, o_ref, scr, buf, sems):
    _seed(a_ref, scr)
    acc = jnp.zeros((128, 128), jnp.float32)
    for db in range(NDB):
        m = scr[:, pl.ds(db, 1), :].reshape(Ms, 128)
        acc += m
    o_ref[:] = acc * 1e-9 + a_ref[:]


def dma_sync(a_ref, o_ref, scr, buf, sems):
    _seed(a_ref, scr)
    acc = jnp.zeros((128, 128), jnp.float32)
    for db in range(NDB):
        cp = pltpu.make_async_copy(scr.at[:, pl.ds(db, 1), :],
                                   buf.at[db % 2], sems.at[db % 2])
        cp.start()
        cp.wait()
        acc += buf[db % 2, :, 0, :]
    o_ref[:] = acc * 1e-9 + a_ref[:]


def dma_pipe(a_ref, o_ref, scr, buf, sems):
    _seed(a_ref, scr)

    def cp(db, slot):
        return pltpu.make_async_copy(scr.at[:, pl.ds(db, 1), :],
                                     buf.at[slot], sems.at[slot])

    cp(0, 0).start()
    acc = jnp.zeros((128, 128), jnp.float32)
    for db in range(NDB):
        slot = db % 2
        if db + 1 < NDB:
            cp(db + 1, 1 - slot).start()
        cp(db, slot).wait()
        acc += buf[slot, :, 0, :]
    o_ref[:] = acc * 1e-9 + a_ref[:]


def main():
    for name, b in [("strided_read", strided_read),
                    ("dma_sync    ", dma_sync),
                    ("dma_pipe    ", dma_pipe)]:
        try:
            print(f"{name}: {bench(b):7.1f} ns/db", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__} {str(e)[:180]}", flush=True)


if __name__ == "__main__":
    main()
