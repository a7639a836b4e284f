"""Microbench: per-tile cost of in-kernel (128,128) f32 transpose vs lane-gather
vs MXU-transpose on the real TPU chip.  Informs the fused-XBAR kernel design.

Method: one Pallas kernel holding a (128,128) block in VMEM, running R
serialized iterations of the primitive inside a fori_loop; time(R2)-time(R1)
/ (R2-R1) = per-op cost.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, x, *args, reps=6):
    fn(x, *args).block_until_ready()
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        fn(x * (1.0 + 1e-7 * i), *args).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make(kind, R):
    def kernel(x_ref, i_ref, o_ref):
        def body(k, v):
            if kind == "transpose":
                return v.T * (1.0 + 1e-9 * k)
            if kind == "gather":
                return jnp.take_along_axis(v, i_ref[:], axis=1) * (1.0 + 1e-9 * k)
            if kind == "gather_t":
                return jnp.take_along_axis(v.T, i_ref[:], axis=1)
            if kind == "mxu_t":
                eye = jnp.eye(128, dtype=jnp.float32)
                return jax.lax.dot(v.T, eye, preferred_element_type=jnp.float32) * (1.0 + 1e-9 * k)
            if kind == "roll":
                return pltpu.roll(v, 1, 1) * (1.0 + 1e-9 * k)
            raise ValueError(kind)
        o_ref[:] = jax.lax.fori_loop(0, R, body, x_ref[:])

    @jax.jit
    def run(x, i):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(x, i)
    return run


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (128, 128)), jnp.int32)
    R1, R2 = 256, 1024
    for kind in ["transpose", "gather", "gather_t", "mxu_t", "roll"]:
        try:
            t1 = timed(make(kind, R1), x, idx)
            t2 = timed(make(kind, R2), x, idx)
            per = (t2 - t1) / (R2 - R1) * 1e9
            print(f"{kind:10s} {per:8.1f} ns/tile  ({per*0.94:6.0f} cyc @0.94GHz)")
        except Exception as e:  # noqa: BLE001
            print(f"{kind:10s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
