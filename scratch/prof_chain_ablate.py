"""Ablate the chain kernel (ops/xbar.py::_chain_call) phase by phase on the
real chip.  Same grid/loops/residency; compute selectively stubbed:
  full     — real kernel
  p2-sum   — phase 2 reads each slab but only sum-reduces (no roll/T/gather)
  p2-skip  — phase 2 loop empty
  p1-mul   — phase 1 without gathers/transposes (keeps table reads + stores)
  p1-nordd — phase 1 without table READS either (mul + store only)
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


def make_call(op, variant, iters):
    C_src, Bs, Bd, banks, cb_s, Cb_pad = (op.C_src, op.Bs, op.Bd, op.banks,
                                          op.cb_s, op.Cb_pad)
    bw = banks * 128
    G = 4
    while G > 1 and Bs % G:
        G //= 2
    P1 = Bs // G
    G2 = xbar._k2_group(Bd, Cb_pad)
    P2 = Bd // G2
    Ms = 128 if Bs < 128 else Bs

    def kernel(t0_ref, inv_ref, is_ref, vs_ref, i2_ref, i3_ref, acc_ref,
               tout_ref, term_scr, y_scr, o_scr):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            term_scr[:] = t0_ref[:]
            acc_ref[:] = t0_ref[:]
            y_scr[:] = jnp.zeros_like(y_scr)
            if Ms > Bs:
                o_scr[pl.ds(Bs, Ms - Bs), :, :] = jnp.zeros(
                    (Ms - Bs, Bd, 128), jnp.float32)

        def p1_body(sg, carry):
            for g in range(G):
                sb = sg * G + g
                h0 = jax.lax.rem(sb, cb_s) * 128
                xb = term_scr[pl.ds(h0, 128), :]
                r0 = sb * 128
                if variant == "p1-nordd":
                    prod = xb * 1.0001
                    for t in range(banks):
                        w = min(128, Bd - t * 128)
                        o_scr[pl.ds(sb, 1), pl.ds(t * 128, w), :] = prod[:w][None]
                elif variant == "p1-mul":
                    prod = xb * vs_ref[pl.ds(r0, 128), :]
                    eps = jnp.sum(is_ref[pl.ds(r0, 128), :].astype(jnp.float32)
                                  + i2_ref[pl.ds(r0, 128), 0:128].astype(jnp.float32)) * 0.0
                    for t in range(banks):
                        w = min(128, Bd - t * 128)
                        o_scr[pl.ds(sb, 1), pl.ds(t * 128, w), :] = prod[:w][None] + eps
                else:
                    idx = is_ref[pl.ds(r0, 128), :]
                    prod = jnp.take_along_axis(xb, idx, axis=1) * vs_ref[pl.ds(r0, 128), :]
                    t1 = prod.T
                    for t in range(banks):
                        it = i2_ref[pl.ds(r0, 128), t * 128:(t + 1) * 128]
                        o2b = jnp.take_along_axis(t1, it, axis=1)
                        w = min(128, Bd - t * 128)
                        o_scr[pl.ds(sb, 1), pl.ds(t * 128, w), :] = o2b.T[:w][None]
            return carry

        jax.lax.fori_loop(0, P1, p1_body, 0, unroll=False)

        def p2_body(j2, carry):
            db0 = j2 * G2
            if variant == "p2-skip":
                y_scr[0:128, :] += jnp.float32(1e-30)
            elif variant == "p2-sum":
                for jj in range(Cb_pad):
                    acc = None
                    for hh in range(G2 // Cb_pad):
                        ii = hh * Cb_pad + jj
                        m = o_scr[:, pl.ds(db0 + ii, 1), :].reshape(Ms, 128)
                        sm = jnp.broadcast_to(
                            jnp.sum(m, axis=0, keepdims=True), (128, 128))
                        acc = sm if acc is None else acc + sm
                    y_scr[jj * 128:(jj + 1) * 128, :] += acc
            else:
                def read_slab(ii):
                    return o_scr[:, pl.ds(db0 + ii, 1), :].reshape(Ms, 128)
                xbar._phase2_body(
                    read_slab,
                    lambda ii: i3_ref[pl.ds((db0 + ii) * 128, 128), :],
                    y_scr, db0, G2, Cb_pad, Ms)
            return carry

        jax.lax.fori_loop(0, P2, p2_body, 0, unroll=False)

        t_new = -(inv_ref[:] * y_scr[:])
        term_scr[:] = t_new
        acc_ref[:] = acc_ref[:] + t_new
        y_scr[:] = jnp.zeros_like(y_scr)

        @pl.when(j == iters - 1)
        def _():
            tout_ref[:] = t_new

    Hs = Bs * 128
    vec = lambda: pl.BlockSpec((C_src, 128), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(iters,),
        in_specs=[vec(), vec(),
                  pl.BlockSpec((Hs, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((Hs, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((Hs, bw), lambda j: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((Bd * 128, 128), lambda j: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=(vec(), vec()),
        out_shape=(jax.ShapeDtypeStruct((C_src, 128), jnp.float32),
                   jax.ShapeDtypeStruct((C_src, 128), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((C_src, 128), jnp.float32),
            pltpu.VMEM((Cb_pad * 128, 128), jnp.float32),
            pltpu.VMEM((Ms, Bd, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )


ITERS = 14


def device_time(call, op, t0, r_short=8, r_long=40):
    """Chain-of-solves slope (the only timing the tunnel reports reliably:
    single-launch wall times carry a noisy ~36 ms RPC envelope)."""
    def make(R):
        @jax.jit
        def run(op_, t):
            inv2d = op_.inv_diag.reshape(op_.C_src, 128)

            def body(i, v):
                acc, term = call(v * (1.0 + 1e-9 * i), inv2d,
                                 op_.idx_src, op_.val_src, op_.idx2,
                                 op_.idx3)
                return acc
            return jax.lax.fori_loop(0, R, body, t)
        return run
    fs, fl = make(r_short), make(r_long)
    float(np.asarray(jax.device_get(fs(op, t0)))[0, 0])
    float(np.asarray(jax.device_get(fl(op, t0)))[0, 0])
    ts, tl = [], []
    for i in range(4):
        t0h = time.perf_counter()
        float(np.asarray(jax.device_get(fs(op, t0 * (1 + 1e-6 * i))))[0, 0])
        ts.append(time.perf_counter() - t0h)
        t0h = time.perf_counter()
        float(np.asarray(jax.device_get(fl(op, t0 * (1 + 1e-6 * i))))[0, 0])
        tl.append(time.perf_counter() - t0h)
    return (min(tl) - min(ts)) / (r_long - r_short) / ITERS * 1e6


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    A = slt.generate("random-sparse", n, seed=7, density=1e-4)
    op = A.op()
    assert op.chain_ready
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.standard_normal((op.C_src, 128)), jnp.float32)
    res = {}
    for variant in ("full", "p2-sum", "p2-skip", "p1-mul", "p1-nordd"):
        per = device_time(make_call(op, variant, ITERS), op, t0)
        res[variant] = per
        print(f"{variant:>9}: {per:7.1f} us/iter", flush=True)
    print(f"\np2 ops beyond extract+sum : {res['full']-res['p2-sum']:6.1f}")
    print(f"p2 total                  : {res['full']-res['p2-skip']:6.1f}")
    print(f"p1 gathers+transposes     : {res['full']-res['p1-mul']:6.1f}")
    print(f"p1 table reads            : {res['p1-mul']-res['p1-nordd']:6.1f}")


if __name__ == "__main__":
    main()
