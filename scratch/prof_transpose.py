"""Isolate the XBAR compute units: measure (128,128) lane-gathers, XLU
transposes, and MXU-dot transposes alone and interleaved, on the real chip.

Hypothesis from prof_xbar: ~568 tile transposes/matvec at ~162 ns each are
the bottleneck and do NOT overlap the gathers.  If an MXU-dot transpose
(exact for f32 via identity matmul) runs on a different port, interleaving
gather+mxu-T should cost ~max() instead of ~sum().
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

N_BLK = 120  # mimic Bs


def bench_kernel(body, n_in=2, reps_long=512, reps_short=64):
    """body(refs..., out_ref) consuming n_in (128,128) f32 inputs."""
    call = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
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
    b = jnp.asarray(rng.integers(0, 128, (128, 128)), jnp.float32)
    fs, fl = make(reps_short), make(reps_long)
    np.asarray(fs(a, b)); np.asarray(fl(a, b))
    ts, tl = [], []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fs(a, b)); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fl(a, b)); tl.append(time.perf_counter() - t0)
    per_call = (min(tl) - min(ts)) / (reps_long - reps_short) * 1e6
    return per_call / N_BLK * 1000  # ns per block-iteration


EYE = np.eye(128, dtype=np.float32)


def mxu_T(x):
    return jax.lax.dot_general(x, jnp.asarray(EYE), (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def main():
    idx_f = None

    def gathers_only(a_ref, i_ref, o_ref):
        idx = i_ref[:].astype(jnp.int32)
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(N_BLK):
            acc = acc + jnp.take_along_axis(a_ref[:] + g, idx, axis=1)
        o_ref[:] = acc * 1e-6 + a_ref[:]

    def xlu_T_only(a_ref, i_ref, o_ref):
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(N_BLK):
            acc = acc + (a_ref[:] + g).T
        o_ref[:] = acc * 1e-6 + a_ref[:]

    def mxu_T_only(a_ref, i_ref, o_ref):
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(N_BLK):
            acc = acc + mxu_T(a_ref[:] + g)
        o_ref[:] = acc * 1e-6 + a_ref[:]

    def gather_plus_xluT(a_ref, i_ref, o_ref):
        idx = i_ref[:].astype(jnp.int32)
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(N_BLK):
            p = jnp.take_along_axis(a_ref[:] + g, idx, axis=1)
            acc = acc + p.T
        o_ref[:] = acc * 1e-6 + a_ref[:]

    def gather_plus_mxuT(a_ref, i_ref, o_ref):
        idx = i_ref[:].astype(jnp.int32)
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(N_BLK):
            p = jnp.take_along_axis(a_ref[:] + g, idx, axis=1)
            acc = acc + mxu_T(p)
        o_ref[:] = acc * 1e-6 + a_ref[:]

    # phase-1 shape: 1 gather + 1 T + 2*(gather + T)  per block
    def phase1_xlu(a_ref, i_ref, o_ref):
        idx = i_ref[:].astype(jnp.int32)
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(N_BLK):
            p = jnp.take_along_axis(a_ref[:] + g, idx, axis=1)
            t1 = p.T
            for t in range(2):
                o2 = jnp.take_along_axis(t1, idx, axis=1)
                acc = acc + o2.T
        o_ref[:] = acc * 1e-6 + a_ref[:]

    def phase1_mxu_t2(a_ref, i_ref, o_ref):
        """T1 on XLU, the two o2b transposes on MXU."""
        idx = i_ref[:].astype(jnp.int32)
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(N_BLK):
            p = jnp.take_along_axis(a_ref[:] + g, idx, axis=1)
            t1 = p.T
            for t in range(2):
                o2 = jnp.take_along_axis(t1, idx, axis=1)
                acc = acc + mxu_T(o2)
        o_ref[:] = acc * 1e-6 + a_ref[:]

    def roll_only(a_ref, i_ref, o_ref):
        acc = jnp.zeros((128, 128), jnp.float32)
        for g in range(N_BLK):
            acc = acc + pltpu.roll(a_ref[:] + g, -(g % 97), 1)
        o_ref[:] = acc * 1e-6 + a_ref[:]

    for name, body in [
        ("gathers_only  ", gathers_only),
        ("xlu_T_only    ", xlu_T_only),
        ("mxu_T_only    ", mxu_T_only),
        ("roll_only     ", roll_only),
        ("gather+xluT   ", gather_plus_xluT),
        ("gather+mxuT   ", gather_plus_mxuT),
        ("phase1_xlu    ", phase1_xlu),
        ("phase1_mxu_t2 ", phase1_mxu_t2),
    ]:
        try:
            ns = bench_kernel(body)
            print(f"{name}: {ns:8.1f} ns/block-iter")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
