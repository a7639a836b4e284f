"""Device: time-to-1e-6 on hard SPD systems — multi-launch PCG vs chain PCG
vs Neumann chain (verdict item 3 'done' check)."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from sublinear_tpu.generate import catalog_matrix
from sublinear_tpu.solvers.cg import _cg_run, _cg_chain_run
from sublinear_tpu.solvers import base as sbase


def time_solver(fn, b_pad, R=24):
    """Chain R serialized solves inside one jit; slope-free total/R after
    warmup (solves are serialized via prev-solution feedback)."""
    @jax.jit
    def chain(b_pad, s):
        def one(carry, j):
            prev, _ = carry
            bs = b_pad * (1.0 + 0.01 * s * (j + 1)) + 1e-6 * prev
            x, k, res = fn(bs)
            return (x, res), (res / jnp.linalg.norm(bs), k)
        (xf, _), (rs, ks) = jax.lax.scan(one, (jnp.zeros_like(b_pad), 0.0),
                                         jnp.arange(R, dtype=b_pad.dtype))
        return xf[0], jnp.max(rs), jnp.max(ks)
    o = chain(b_pad, 1.0); float(np.asarray(jax.device_get(o[0])))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        o = chain(b_pad, 1.0 + 0.1 * i)
        float(np.asarray(jax.device_get(o[0])))
        ts.append(time.perf_counter() - t0)
    return min(ts) / R * 1e3, float(jax.device_get(o[1])), int(jax.device_get(o[2]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    margin = float(sys.argv[2]) if len(sys.argv) > 2 else 1.05
    # large sparse SPD with weak diagonal dominance (Jacobi rho ~ 1/margin):
    # the regime where CG's sqrt(cond) iteration count beats Neumann's
    # 1/log(1/rho) (the catalog's spd_ill/tridiagonal+0.3 run dense QR /
    # DIA paths; this is the sparse-SPD analog at scale)
    rng = np.random.default_rng(7)
    cnt = n * 5
    r_ = rng.integers(0, n, cnt); c_ = rng.integers(0, n, cnt)
    v_ = rng.uniform(-1, 1, cnt)
    off = r_ != c_
    r_, c_, v_ = r_[off], c_[off], v_[off]
    rows = np.r_[r_, c_]; cols = np.r_[c_, r_]; vals = np.r_[v_, v_]
    dg = np.zeros(n); np.add.at(dg, rows, np.abs(vals))
    rows = np.r_[rows, np.arange(n)]; cols = np.r_[cols, np.arange(n)]
    vals = np.r_[vals, dg * margin + 1e-3]
    from sublinear_tpu.matrix import Matrix
    Ax = Matrix.from_coo(rows, cols, vals, (n, n), prefer="xbar")
    kind = f"spd-sparse margin={margin}"
    op = Ax.op()
    print(f"{kind} n={n}: kind={Ax._op_kind()} chain={getattr(op,'chain_ready',False)} "
          f"P={getattr(op,'P',0)} Bd={getattr(op,'Bd',0)}", file=sys.stderr)
    b = slt.rhs(n, seed=7)
    b_full = np.zeros(op.m_pad); b_full[:n] = b
    b_pad = jnp.asarray(b_full, jnp.float32)
    thr = sbase.threshold_for(b, slt.SolverOptions(epsilon=1e-6))

    x0 = jnp.zeros_like(b_pad)
    mi = jnp.int32(400)

    def f_multi(bs):
        x, k, res, _ = _cg_run(op, bs, x0, thr, mi, True)
        return x, k, res

    def f_chain(bs):
        return _cg_chain_run(op, bs, x0, thr, mi, 7)

    def f_neu(bs):
        inv_d = op.inv_diag
        def cond(st):
            x, t, k, res = st
            return (res > thr) & (k < mi)
        def body(st):
            x, t, k, _ = st
            acc, t2, rr = op.neumann_chain(t, 10, with_residual=True)
            return x + (acc - t), t2, k + 10, jnp.linalg.norm(rr)
        t0 = inv_d * bs
        x, t, k, res = jax.lax.while_loop(
            cond, body, (t0, t0, jnp.int32(0),
                         jnp.asarray(jnp.finfo(jnp.float32).max / 4)))
        return x, k, res

    for nm, f in (("multi-launch PCG", f_multi), ("chain PCG", f_chain),
                  ("Neumann chain", f_neu)):
        try:
            ms, res, k = time_solver(f, b_pad)
            print(f"{nm:>18}: {ms:8.3f} ms/solve  max_rel_res={res:.2e}  iters<={k}")
        except Exception as e:
            print(f"{nm:>18}: FAIL {str(e)[:150]}")


if __name__ == "__main__":
    main()
