"""Round-5 deeper staging experiments on the chain kernel.

Building on the finding that Mosaic does NOT interleave independent
dependency chains automatically (manual staging won ~10 us in phase 1,
~24 us in phase 2):
  - p1 typed staging (all reads, all gathers, all muls, all Ts, ...)
  - wider p1 trips (G=12/24)
  - p2 staged across TWO p2-steps (28 chains)
  - p2 big block read (full (Ms,G2,128) read then register extracts)

Variant string: comma-separated tokens, e.g. "g8-split-p2all" (baseline
winner so far), "g24-typed-p2all", "g8-split-p2x2", "g8-split-p2big".
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from sublinear_tpu.ops import xbar

ROT = xbar.ROT


def staged_phase2_multi(o_scr, i3_ref, y_ref, db0, nblk, G2, Cb_pad, Ms,
                        bigread):
    """Stage nblk consecutive dest blocks' chains op-by-op; nblk spans
    nblk//Cb_pad hh-groups of the SAME jj set when aligned."""
    iis = list(range(nblk))
    if bigread:
        big = o_scr[:, pl.ds(db0, nblk), :]          # (Ms, nblk, 128)
        ms = [big[:, i, :] for i in iis]
    else:
        ms = [o_scr[:, pl.ds(db0 + i, 1), :].reshape(Ms, 128) for i in iis]
    mps = []
    for i, m in zip(iis, ms):
        k = (db0 + i) // Cb_pad
        s_k = (k * ROT) % 128
        mps.append(pltpu.roll(m, (128 - s_k) % 128, 1))
    mts = [mp.T for mp in mps]
    o3s = [jnp.take_along_axis(mt, i3_ref[pl.ds((db0 + i) * 128, 128), :],
                               axis=1) for i, mt in zip(iis, mts)]
    for jj in range(Cb_pad):
        acc = None
        for i in iis:
            if i % Cb_pad == jj:
                acc = o3s[i] if acc is None else acc + o3s[i]
        y_ref[jj * 128:(jj + 1) * 128, :] += acc


def make_call(op, variant, iters):
    C_src, Bs, Bd, banks, cb_s, Cb_pad = (op.C_src, op.Bs, op.Bd, op.banks,
                                          op.cb_s, op.Cb_pad)
    bw = banks * 128
    toks = variant.split("-")
    G = int(toks[0][1:])
    p1mode = toks[1]            # split | typed
    p2mode = toks[2]            # p2all | p2x2 | p2big
    assert Bs % G == 0
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
            if p1mode == "split":
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
            else:  # typed
                sbs = [sg * G + g for g in range(G)]
                h0s = [jax.lax.rem(sb, cb_s) * 128 for sb in sbs]
                xbs = [term_scr[pl.ds(h0, 128), :] for h0 in h0s]
                idxs = [is_ref[pl.ds(sb * 128, 128), :] for sb in sbs]
                gs = [jnp.take_along_axis(xb, idx, axis=1)
                      for xb, idx in zip(xbs, idxs)]
                vss = [vs_ref[pl.ds(sb * 128, 128), :] for sb in sbs]
                prods = [g_ * v for g_, v in zip(gs, vss)]
                t1s = [p.T for p in prods]
                its = [[i2_ref[pl.ds(sb * 128, 128), t * 128:(t + 1) * 128]
                        for t in range(banks)] for sb in sbs]
                o2bs = [[jnp.take_along_axis(t1s[g], its[g][t], axis=1)
                         for t in range(banks)] for g in range(G)]
                for g in range(G):
                    sb = sbs[g]
                    for t in range(banks):
                        w = min(128, Bd - t * 128)
                        o_scr[pl.ds(sb, 1), pl.ds(t * 128, w), :] = \
                            o2bs[g][t].T[:w][None]
            return carry
        jax.lax.fori_loop(0, P1, p1_body, 0, unroll=False)

        if p2mode == "p2x2":
            nblk, bigread = 2 * G2, False
        elif p2mode == "p2big":
            nblk, bigread = G2, True
        elif p2mode.startswith("p2w"):
            nblk, bigread = int(p2mode[3:]), False
        else:
            nblk, bigread = G2, False
        u2 = 2 * Cb_pad
        assert nblk % u2 == 0
        main_steps = Bd // nblk
        rem = Bd - main_steps * nblk

        def p2_body(j2, carry):
            staged_phase2_multi(o_scr, i3_ref, y_scr, j2 * nblk, nblk, G2,
                                Cb_pad, Ms, bigread)
            return carry
        jax.lax.fori_loop(0, main_steps, p2_body, 0, unroll=False)
        if rem:
            assert rem % u2 == 0
            staged_phase2_multi(o_scr, i3_ref, y_scr, main_steps * nblk,
                                rem, G2, Cb_pad, Ms, bigread)

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


def main():
    import glob, gzip, json, os, time
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    variants = sys.argv[2].split(",")
    R = 30
    A = slt.generate("random-sparse", n, seed=7, density=1e-4)
    op = A.op()
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.standard_normal((op.C_src, 128)), jnp.float32)

    ref = None
    for v in variants:
        try:
            call = make_call(op, v, ITERS)

            @jax.jit
            def run(op_, t, call=call):
                inv2d = op_.inv_diag.reshape(op_.C_src, 128)

                def body(i, vv):
                    acc, term = call(vv * (1.0 + 1e-9 * i), inv2d,
                                     op_.idx_src, op_.val_src, op_.idx2,
                                     op_.idx3)
                    return acc
                return jax.lax.fori_loop(0, R, body, t)
            a = np.asarray(jax.device_get(run(op, t0)))
            if ref is None:
                ref = a
            else:
                err = float(np.abs(a - ref).max())
                assert err < 1e-4, (v, err)
            tdir = f"/tmp/r5v3_{v}"
            os.system(f"rm -rf {tdir}")
            with jax.profiler.trace(tdir):
                float(np.asarray(jax.device_get(run(op, t0)))[0, 0])
            files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
            durs = []
            with gzip.open(files[0], "rt") as f:
                tr = json.load(f)
            for ev in tr.get("traceEvents", []):
                if ev.get("ph") == "X" and ev.get("name", "").startswith("closed_call"):
                    durs.append(ev.get("dur", 0) / ITERS)
            d = np.array(sorted(durs))
            print(f"{v:>18}: min {d.min():6.1f}  med {np.median(d):6.1f} us/iter (n={len(d)})", flush=True)
        except Exception as e:
            print(f"{v:>18}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
