"""Round-5 phase-1 variants for the chain kernel (attack the gather anomaly).

Variants (all keep phase 2 + epilogue identical to the shipped kernel):
  base     — shipped iteration order: sb sequential, dynamic h0 = rem(sb,cb_s)
  hmajor   — outer STATIC loop over hc (xb = static slice, read once per hc),
             inner fori over planes p; skips structurally-zero pad blocks
             (their o_scr rows are zeroed once at j==0)
  hunroll  — hmajor with the plane loop fully unrolled (everything static)
  split    — base order, but each G-trip does all G1+T1 first (t1 stack in
             registers), then all G2+stores (breaks the per-block serial
             dependency chain G1->T1->G2->store)
  hsplit   — hmajor + split staging within each hc group
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
    P = op.P
    real_bs = P * cb_s          # blocks [real_bs, Bs) are structurally zero
    G = 8
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
            if variant in ("hmajor", "hunroll", "hsplit") and real_bs < Bs:
                o_scr[pl.ds(real_bs, Bs - real_bs), :, :] = jnp.zeros(
                    (Bs - real_bs, Bd, 128), jnp.float32)

        def block_body(sb, h0, xb=None, static_r0=None):
            if xb is None:
                xb = term_scr[pl.ds(h0, 128), :]
            r0 = sb * 128 if static_r0 is None else static_r0
            idx = is_ref[pl.ds(r0, 128), :]
            prod = jnp.take_along_axis(xb, idx, axis=1) * vs_ref[pl.ds(r0, 128), :]
            t1 = prod.T
            for t in range(banks):
                it = i2_ref[pl.ds(r0, 128), t * 128:(t + 1) * 128]
                o2b = jnp.take_along_axis(t1, it, axis=1)
                w = min(128, Bd - t * 128)
                o_scr[pl.ds(sb, 1), pl.ds(t * 128, w), :] = o2b.T[:w][None]

        if variant == "base":
            def p1_body(sg, carry):
                for g in range(G):
                    sb = sg * G + g
                    h0 = jax.lax.rem(sb, cb_s) * 128
                    block_body(sb, h0)
                return carry
            jax.lax.fori_loop(0, P1, p1_body, 0, unroll=False)
        elif variant == "split":
            def p1_body(sg, carry):
                t1s = []
                for g in range(G):
                    sb = sg * G + g
                    h0 = jax.lax.rem(sb, cb_s) * 128
                    xb = term_scr[pl.ds(h0, 128), :]
                    r0 = sb * 128
                    idx = is_ref[pl.ds(r0, 128), :]
                    prod = jnp.take_along_axis(xb, idx, axis=1) * vs_ref[pl.ds(r0, 128), :]
                    t1s.append(prod.T)
                for g in range(G):
                    sb = sg * G + g
                    r0 = sb * 128
                    for t in range(banks):
                        it = i2_ref[pl.ds(r0, 128), t * 128:(t + 1) * 128]
                        o2b = jnp.take_along_axis(t1s[g], it, axis=1)
                        w = min(128, Bd - t * 128)
                        o_scr[pl.ds(sb, 1), pl.ds(t * 128, w), :] = o2b.T[:w][None]
                return carry
            jax.lax.fori_loop(0, P1, p1_body, 0, unroll=False)
        elif variant == "hmajor":
            for hc in range(cb_s):
                xb0 = term_scr[hc * 128:(hc + 1) * 128, :]

                def ph_body(p, carry, hc=hc, xb0=xb0):
                    sb = p * cb_s + hc
                    block_body(sb, None, xb=xb0)
                    return carry
                jax.lax.fori_loop(0, P, ph_body, 0, unroll=False)
        elif variant == "hsplit":
            HG = 4  # planes per staged group
            for hc in range(cb_s):
                xb0 = term_scr[hc * 128:(hc + 1) * 128, :]

                def ph_body(pg, carry, hc=hc, xb0=xb0):
                    t1s = []
                    for gg in range(HG):
                        sb = (pg * HG + gg) * cb_s + hc
                        r0 = sb * 128
                        idx = is_ref[pl.ds(r0, 128), :]
                        prod = jnp.take_along_axis(xb0, idx, axis=1) * vs_ref[pl.ds(r0, 128), :]
                        t1s.append(prod.T)
                    for gg in range(HG):
                        sb = (pg * HG + gg) * cb_s + hc
                        r0 = sb * 128
                        for t in range(banks):
                            it = i2_ref[pl.ds(r0, 128), t * 128:(t + 1) * 128]
                            o2b = jnp.take_along_axis(t1s[gg], it, axis=1)
                            w = min(128, Bd - t * 128)
                            o_scr[pl.ds(sb, 1), pl.ds(t * 128, w), :] = o2b.T[:w][None]
                    return carry
                assert P % HG == 0
                jax.lax.fori_loop(0, P // HG, ph_body, 0, unroll=False)
        elif variant == "hunroll":
            for hc in range(cb_s):
                xb0 = term_scr[hc * 128:(hc + 1) * 128, :]
                for p in range(P):
                    sb = p * cb_s + hc
                    block_body(sb, None, xb=xb0, static_r0=sb * 128)
        else:
            raise ValueError(variant)

        def p2_body(j2, carry):
            db0 = j2 * G2

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
    a = np.asarray(jax.device_get(fs(op, t0)))
    float(np.asarray(jax.device_get(fl(op, t0)))[0, 0])
    ts, tl = [], []
    for i in range(4):
        t0h = time.perf_counter()
        float(np.asarray(jax.device_get(fs(op, t0 * (1 + 1e-6 * i))))[0, 0])
        ts.append(time.perf_counter() - t0h)
        t0h = time.perf_counter()
        float(np.asarray(jax.device_get(fl(op, t0 * (1 + 1e-6 * i))))[0, 0])
        tl.append(time.perf_counter() - t0h)
    return (min(tl) - min(ts)) / (r_long - r_short) / ITERS * 1e6, a


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "base", "hmajor", "hsplit", "split", "hunroll"]
    A = slt.generate("random-sparse", n, seed=7, density=1e-4)
    op = A.op()
    assert op.chain_ready
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.standard_normal((op.C_src, 128)), jnp.float32)
    ref = None
    for variant in variants:
        per, acc = device_time(make_call(op, variant, ITERS), op, t0)
        if ref is None:
            ref = acc
            tag = "(ref)"
        else:
            err = float(np.abs(acc - ref).max())
            tag = f"maxdiff={err:.2e}"
            assert err < 1e-4, (variant, err)
        print(f"{variant:>8}: {per:7.1f} us/iter  {tag}", flush=True)


if __name__ == "__main__":
    main()
