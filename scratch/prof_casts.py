"""Measure index-cast and gather-index-dtype costs on the real chip:
does take_along_axis accept i8/i16 indices directly, and what does each
i8->i32 cast cost?  Drives the idx-table dtype choice for the XBAR kernel.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

N_BLK = 120


def bench(body, idx_dtype, reps_long=512, reps_short=64):
    call = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )

    def make(R):
        @jax.jit
        def run(a, b):
            def step(i, v):
                return call(v, b) * (1.0 + 1e-12 * i)
            return jax.lax.fori_loop(0, R, step, a)
        return run

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    b = jnp.asarray(rng.integers(0, 128, (128, 128)), idx_dtype)
    fs, fl = make(reps_short), make(reps_long)
    np.asarray(fs(a, b)); np.asarray(fl(a, b))
    ts, tl = [], []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fs(a, b)); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fl(a, b)); tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (reps_long - reps_short) * 1e6 / N_BLK * 1000


def gather_direct(a_ref, i_ref, o_ref):
    """Gather with the stored dtype directly (no cast)."""
    idx = i_ref[:]
    acc = jnp.zeros((128, 128), jnp.float32)
    for g in range(N_BLK):
        acc = acc + jnp.take_along_axis(a_ref[:] + g, idx, axis=1)
    o_ref[:] = acc * 1e-6 + a_ref[:]


def gather_cast_once(a_ref, i_ref, o_ref):
    idx = i_ref[:].astype(jnp.int32)
    acc = jnp.zeros((128, 128), jnp.float32)
    for g in range(N_BLK):
        acc = acc + jnp.take_along_axis(a_ref[:] + g, idx, axis=1)
    o_ref[:] = acc * 1e-6 + a_ref[:]


def gather_cast_each(a_ref, i_ref, o_ref):
    """Mimic the real kernel: a FRESH cast per block (different slabs)."""
    acc = jnp.zeros((128, 128), jnp.float32)
    for g in range(N_BLK):
        idx = (i_ref[:] + (g - g)).astype(jnp.int32)
        acc = acc + jnp.take_along_axis(a_ref[:] + g, idx, axis=1)
    o_ref[:] = acc * 1e-6 + a_ref[:]


def cast_only(a_ref, i_ref, o_ref):
    acc = jnp.zeros((128, 128), jnp.int32)
    for g in range(N_BLK):
        acc = acc + (i_ref[:] + (g - g)).astype(jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * 1e-6 + a_ref[:]


def main():
    for name, body, dt in [
        ("gather_i32_direct ", gather_direct, jnp.int32),
        ("gather_i8_direct  ", gather_direct, jnp.int8),
        ("gather_i16_direct ", gather_direct, jnp.int16),
        ("gather_i8_cast1   ", gather_cast_once, jnp.int8),
        ("gather_i8_castN   ", gather_cast_each, jnp.int8),
        ("gather_i16_castN  ", gather_cast_each, jnp.int16),
        ("cast_i8_only      ", cast_only, jnp.int8),
        ("cast_i16_only     ", cast_only, jnp.int16),
    ]:
        try:
            ns = bench(body, dt)
            print(f"{name}: {ns:8.1f} ns/block-iter", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
