"""Device timing of the fused XBAR matvec on the real chip.

Chain-differenced: the matvec chained y->x in a fori_loop of R_long vs
R_short reps; slope = per-matvec time.  Run: python scratch/prof_xbar.py [n density]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from sublinear_tpu.ops import xbar


def chain_time(fn, op, x0, r_short=64, r_long=512, reps=4):
    """fn(op, x) -> x-shaped; op passed as a pytree ARGUMENT (a closure would
    embed the operator arrays as constants and blow compile time)."""
    def make(R):
        @jax.jit
        def run(op, x):
            def body(i, v):
                return fn(op, v) * (1.0 + 1e-9 * i)
            return jax.lax.fori_loop(0, R, body, x)
        return run
    fs, fl = make(r_short), make(r_long)
    np.asarray(jax.device_get(fs(op, x0)))
    np.asarray(jax.device_get(fl(op, x0)))
    ts, tl = [], []
    for i in range(reps):
        t0 = time.perf_counter(); np.asarray(jax.device_get(fs(op, x0 * (1 + 1e-6 * i)))); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(jax.device_get(fl(op, x0 * (1 + 1e-6 * i)))); tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (r_long - r_short) * 1e6  # us


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    density = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    A = slt.generate("random-sparse", n, seed=7, density=density)
    t0 = time.perf_counter()
    op = A.op()
    pack_s = time.perf_counter() - t0
    assert isinstance(op, xbar.XbarOperator), type(op).__name__
    print(f"n={n} nnz={op.nnz} tail={op.tail_nnz} pack={pack_s:.2f}s")
    print(f"C_src={op.C_src} P={op.P} K={op.K} Bs={op.Bs} Bd={op.Bd} banks={op.banks} Cb_pad={op.Cb_pad}")
    mb = op.hbm_bytes_per_matvec / 1e6
    print(f"hbm bytes/matvec = {mb:.1f} MB")

    # correctness spot-check vs numpy
    rng = np.random.default_rng(0)
    x = np.zeros(op.m_pad, np.float32)
    x[:n] = rng.standard_normal(n).astype(np.float32)
    t0 = time.perf_counter()
    mv = jax.jit(lambda o, v: o.matvec(v))
    y = np.asarray(mv(op, jnp.asarray(x)))
    print(f"first compile+run {time.perf_counter()-t0:.1f}s")
    r, c, v = A.csr.to_coo()
    y_ref = np.zeros(n)
    np.add.at(y_ref, np.asarray(r), np.asarray(v) * x[np.asarray(c)])
    err = np.abs(y[:n] - y_ref).max() / (np.abs(y_ref).max() + 1e-30)
    print(f"max rel err vs oracle: {err:.2e}")

    xj = jnp.asarray(x)
    t = chain_time(lambda o, v: o.matvec(v), op, xj)
    bw = mb / t * 1e6 / 1e9
    print(f"matvec: {t:8.1f} us   ({op.nnz / t / 1e3:.1f} Gnnz/s, {bw:.0f} GB/s eff, {bw/608*100:.0f}% of stream roof)")

    # stage split: k1 only
    def k1_only(o, x):
        x2d = x.astype(jnp.float32).reshape(o.C_src, 128)
        o2t = xbar._k1_call(o.C_src, o.Bs, o.Bd, o.banks, o.cb_s)(
            x2d, o.idx_src, o.val_src, o.idx2)
        # reduce back to x-shape so the chain is honest (consumes ALL of o2t)
        s = o2t.sum(axis=(0, 1))
        return jnp.tile(s, o.m_pad // 128) * 1e-6 + x
    t1 = chain_time(k1_only, op, xj)
    print(f"k1(+sum): {t1:6.1f} us")


if __name__ == "__main__":
    main()
