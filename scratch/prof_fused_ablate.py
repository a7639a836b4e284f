"""Ablate the fused XBAR kernel phase by phase on the real chip.

Variants (same grid, same DMA schedule, compute selectively stubbed):
  full       — the real kernel
  p2-extract — phase 2 reads each slab but only sum-reduces it (no
               roll/T/gather/pair-sum)
  p2-skip    — phase 2 does nothing (i3 blocks still stream)
  p1-mul     — phase 1 skips gathers/transposes (writes prod=val block as-is)
Differences give the device cost of each op group.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from sublinear_tpu.ops import xbar


def make_call(op, variant):
    C_src, Bs, Bd, banks, cb_s, Cb_pad = (op.C_src, op.Bs, op.Bd, op.banks,
                                          op.cb_s, op.Cb_pad)
    bw = banks * 128
    G = xbar._k1_group(Bs)
    P1 = Bs // G
    G2 = xbar._k2_group(Bd, Cb_pad)
    P2 = Bd // G2

    def kernel(x_ref, is_ref, vs_ref, i2_ref, i3_ref, y_ref, o_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        @pl.when(i < P1)
        def _():
            for g in range(G):
                sb = i * G + g
                h0 = (sb % cb_s) * 128
                xb = x_ref[pl.ds(h0, 128), :]
                if variant == "p1-mul":
                    prod = xb * vs_ref[g * 128:(g + 1) * 128, :]
                    eps = jnp.sum(i2_ref[g * 128:g * 128 + 16, 0:128]
                                  .astype(jnp.float32)) * 0.0
                    for t in range(banks):
                        w = min(128, Bd - t * 128)
                        o_scr[pl.ds(sb, 1), pl.ds(t * 128, w), :] = (
                            prod[:w][None] + eps)
                else:
                    idx = is_ref[g * 128:(g + 1) * 128, :]
                    prod = jnp.take_along_axis(xb, idx, axis=1) * vs_ref[g * 128:(g + 1) * 128, :]
                    t1 = prod.T
                    for t in range(banks):
                        it = i2_ref[g * 128:(g + 1) * 128, t * 128:(t + 1) * 128]
                        o2b = jnp.take_along_axis(t1, it, axis=1)
                        w = min(128, Bd - t * 128)
                        o_scr[pl.ds(sb, 1), pl.ds(t * 128, w), :] = o2b.T[:w][None]

        @pl.when(i >= P1)
        def _():
            j2 = i - P1
            db0 = j2 * G2
            if variant == "p2-skip":
                y_ref[0:128, :] += i3_ref[0:128, :].astype(jnp.float32) * 0.0
            elif variant == "p2-extract":
                for jj in range(Cb_pad):
                    acc = None
                    for hh in range(G2 // Cb_pad):
                        ii = hh * Cb_pad + jj
                        m = o_scr[:, pl.ds(db0 + ii, 1), :].reshape(Bs, 128)
                        s = jnp.broadcast_to(jnp.sum(m, axis=0, keepdims=True),
                                             (128, 128))
                        acc = s if acc is None else acc + s
                    y_ref[jj * 128:(jj + 1) * 128, :] += acc
            else:
                def read_slab(ii):
                    return o_scr[:, pl.ds(db0 + ii, 1), :].reshape(Bs, 128)
                xbar._phase2_body(read_slab, i3_ref, y_ref, db0, G2, Cb_pad, Bs)

    o2t_bytes = Bs * Bd * 128 * 4
    return pl.pallas_call(
        kernel,
        grid=(P1 + P2,),
        in_specs=[
            pl.BlockSpec((C_src, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 128, 128), lambda i: (jnp.minimum(i, P1 - 1), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 128, 128), lambda i: (jnp.minimum(i, P1 - 1), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 128, bw), lambda i: (jnp.minimum(i, P1 - 1), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G2 * 128, 128), lambda i: (jnp.maximum(i - P1, 0), 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Cb_pad * 128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cb_pad * 128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bs, Bd, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(o2t_bytes + 12 * 1024 * 1024, 100 * 1024 * 1024),
        ),
    )


def device_time(fn, op, x0, R=100):
    @jax.jit
    def chain(op_, x):
        def body(i, v):
            y = fn(op_, v)
            return v * (1.0 + 1e-12 * jnp.sum(y[0, :1]))
        return jax.lax.fori_loop(0, R, body, x)

    np.asarray(jax.device_get(chain(op, x0)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(chain(op, x0)))
        ts.append(time.perf_counter() - t0)
    return min(ts) / R * 1e6


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    A = slt.generate("random-sparse", n, seed=7, density=1e-4)
    op = A.op()
    assert isinstance(op, xbar.XbarOperator) and op.fused
    print(f"P={op.P} K={op.K} Bs={op.Bs} Bd={op.Bd} G={xbar._k1_group(op.Bs)} "
          f"G2={xbar._k2_group(op.Bd, op.Cb_pad)}")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((op.C_src, 128)), jnp.float32)
    res = {}
    for variant in ("full", "p2-extract", "p2-skip", "p1-mul"):
        call = make_call(op, variant)
        fn = lambda o, x: call(x, o.idx_src, o.val_src, o.idx2, o.idx3)
        t = device_time(fn, op, x0)
        res[variant] = t
        print(f"{variant:>11}: {t:7.1f} us", flush=True)
    print(f"\nphase2 compute (full - p2-extract): {res['full']-res['p2-extract']:6.1f} us")
    print(f"phase2 total   (full - p2-skip)   : {res['full']-res['p2-skip']:6.1f} us")
    print(f"phase1 xbar ops (full - p1-mul)   : {res['full']-res['p1-mul']:6.1f} us")


if __name__ == "__main__":
    main()
