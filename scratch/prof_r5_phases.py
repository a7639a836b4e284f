"""Post-staging phase ablation of the integrated chain kernel at the
CURRENT n=100k geometry (P=13): where do the 57.8 us/iter go now?"""
import sys
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
    G, P1, nb, P2, rem2 = xbar._chain_geometry(Bs, Bd, Cb_pad)
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

        if variant in ("full", "p2skip"):
            def p1_body(sg, carry):
                def read_x(g):
                    sb = sg * G + g
                    h0 = jax.lax.rem(sb, cb_s) * 128
                    return term_scr[pl.ds(h0, 128), :]

                def write_out(g, t, v):
                    sb = sg * G + g
                    o_scr[pl.ds(sb, 1), pl.ds(t * 128, v.shape[0]), :] = v[None]

                xbar._staged_phase1(
                    G, banks, Bd, read_x,
                    lambda g: is_ref[pl.ds((sg * G + g) * 128, 128), :],
                    lambda g: vs_ref[pl.ds((sg * G + g) * 128, 128), :],
                    lambda g, t: i2_ref[pl.ds((sg * G + g) * 128, 128),
                                        t * 128:(t + 1) * 128],
                    write_out)
                return carry
            jax.lax.fori_loop(0, P1, p1_body, 0, unroll=False)
        else:  # p1skip: minimal touch so scratch stays defined
            o_scr[pl.ds(0, 1), pl.ds(0, 128), :] = term_scr[pl.ds(0, 128), :][None] * 1e-30

        if variant in ("full", "p1skip"):
            def p2_block(db0, width):
                def read_slab(ii):
                    return o_scr[:, pl.ds(db0 + ii, 1), :].reshape(Ms, 128)
                xbar._phase2_body(read_slab,
                                  lambda ii: i3_ref[pl.ds((db0 + ii) * 128, 128), :],
                                  y_scr, db0, width, Cb_pad, Ms)

            def p2_body(j2, carry):
                p2_block(j2 * nb, nb)
                return carry
            jax.lax.fori_loop(0, P2, p2_body, 0, unroll=False)
            if rem2:
                p2_block(P2 * nb, rem2)
        else:
            y_scr[0:128, :] += jnp.float32(1e-30)

        t_new = -(inv_ref[:] * y_scr[:])
        acc_ref[:] = acc_ref[:] + t_new
        term_scr[:] = t_new

        @pl.when(j == iters - 1)
        def _():
            tout_ref[:] = t_new

        y_scr[:] = jnp.zeros_like(y_scr)

    Hs = Bs * 128
    vec = lambda: pl.BlockSpec((C_src, 128), lambda j: (0, 0), memory_space=pltpu.VMEM)
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
    import glob, gzip, json, os
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    A = slt.generate("random-sparse", n, seed=7, density=1e-4 if n >= 50000 else 1e-3)
    op = A.op()
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.standard_normal((op.C_src, 128)), jnp.float32)
    R = 30
    for v in ("full", "p1skip", "p2skip"):
        call = make_call(op, v, ITERS)

        @jax.jit
        def run(op_, t, call=call):
            inv2d = op_.inv_diag.reshape(op_.C_src, 128)
            def body(i, vv):
                acc, term = call(vv * (1.0 + 1e-9 * i), inv2d,
                                 op_.idx_src, op_.val_src, op_.idx2, op_.idx3)
                return acc
            return jax.lax.fori_loop(0, R, body, t)
        float(np.asarray(jax.device_get(run(op, t0)))[0, 0])
        tdir = f"/tmp/r5ph_{v}"; os.system(f"rm -rf {tdir}")
        with jax.profiler.trace(tdir):
            float(np.asarray(jax.device_get(run(op, t0)))[0, 0])
        durs = []
        with gzip.open(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)[0], "rt") as f:
            tr = json.load(f)
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("name", "").startswith("closed_call"):
                durs.append(ev.get("dur", 0) / ITERS)
        print(f"{v:>7}: {np.median(durs):6.1f} us/iter")


if __name__ == "__main__":
    main()
