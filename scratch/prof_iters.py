"""Residual vs iteration count for the bench ladder systems: find the
smallest fixed Neumann iteration budget that still verifies at 1e-6 with
real margin.  f32 accumulation floors the relative residual near ~1e-7,
so iterations beyond the floor-crossing are pure waste."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt


def probe(n, density):
    A = slt.generate("random-sparse", n, seed=7, density=density)
    op = A.op()
    rng = np.random.default_rng(0)
    b = np.zeros(op.m_pad, np.float32)
    b[:n] = rng.standard_normal(n)
    b_pad = jnp.asarray(b)
    kind = type(op).__name__
    print(f"n={n} kind={kind} chain={getattr(op, 'chain_ready', False)}")
    for iters in (9, 10, 11, 12, 13, 14):
        if getattr(op, "chain_ready", False):
            x, _t, r = jax.jit(lambda bp: op.neumann_chain(
                op.inv_diag * bp, iters, b=bp))(b_pad)
            res = float(jnp.linalg.norm(r) / jnp.linalg.norm(b_pad))
        else:
            term = x = op.inv_diag * b_pad
            for _ in range(iters):
                term = -op.inv_diag * op.offdiag_matvec(term)
                x = x + term
            res = float(jnp.linalg.norm(op.matvec(x) - b_pad)
                        / jnp.linalg.norm(b_pad))
        print(f"  iters={iters:2d}  rel res = {res:.2e}")


if __name__ == "__main__":
    probe(100_000, 1e-4)
    probe(10_000, 1e-3)
    probe(1_000, 1e-3)
