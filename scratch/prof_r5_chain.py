"""Round-5 focused timing: n=100k chain solve (12 passes, residual identity).

Chain-differenced slope, same protocol as bench.py (serialized solves).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt

EPSILON = 1e-6


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    density = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    A = slt.generate("random-sparse", n, seed=7, density=density)
    b = slt.rhs(n, seed=7)
    op = A.op()
    print(f"n={n} kind={A._op_kind()} chain_ready={op.chain_ready} "
          f"P={op.P} K={op.K} Bs={op.Bs} Bd={op.Bd}", file=sys.stderr)
    b_full = np.zeros(op.m_pad); b_full[:len(b)] = b
    b_pad = jnp.asarray(b_full, op.dtype)

    def make_chain(R):
        @jax.jit
        def chain(b_pad, bump):
            inv_d = op.inv_diag

            def solve_one(carry, j):
                prev, _ = carry
                bs = b_pad * (1.0 + 0.01 * bump * (j + 1).astype(op.dtype)) + 1e-6 * prev
                x, _t, r = op.neumann_chain(inv_d * bs, iters, with_residual=True)
                res = jnp.linalg.norm(r) / jnp.linalg.norm(bs)
                return (x, res), res

            (xf, _), ress = jax.lax.scan(
                solve_one, (jnp.zeros_like(b_pad), 0.0), jnp.arange(R))
            return xf[0] + jnp.sum(ress) * 0.0, jnp.max(ress)
        return chain

    r_short, r_long = 4, 20
    short, long_ = make_chain(r_short), make_chain(r_long)
    float(np.asarray(jax.device_get(short(b_pad, 1.0)[0])))
    o2 = long_(b_pad, 1.0); float(np.asarray(jax.device_get(o2[0])))
    t_s, t_l = [], []
    for rep in range(4):
        t0 = time.perf_counter()
        float(np.asarray(jax.device_get(short(b_pad, 1.0 + 0.1 * rep)[0])))
        t_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        o2 = long_(b_pad, 1.0 + 0.1 * rep)
        float(np.asarray(jax.device_get(o2[0])))
        t_l.append(time.perf_counter() - t0)
    per_ms = (min(t_l) - min(t_s)) / (r_long - r_short) * 1e3
    max_res = float(np.asarray(jax.device_get(o2[1])))
    print(f"per-solve {per_ms:.4f} ms ({per_ms*1e3/iters:.1f} us/pass, "
          f"{iters} passes)  max_res={max_res:.2e}  ok={max_res <= 1.5e-6}")


if __name__ == "__main__":
    main()
