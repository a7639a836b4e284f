"""Time the fused Neumann chain vs per-matvec iteration on the real chip."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from sublinear_tpu.ops import xbar

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 14
A = slt.generate("random-sparse", n, seed=7, density=1e-4)
op = A.op()
assert isinstance(op, xbar.XbarOperator)
print(f"P={op.P} K={op.K} Bs={op.Bs} Bd={op.Bd} tail={op.tail_nnz} chain_ready={op.chain_ready}")
rng = np.random.default_rng(0)
b = np.zeros(op.m_pad, np.float32); b[:n] = rng.standard_normal(n)
b_pad = jnp.asarray(b)

@jax.jit
def solve_chain(op, b_pad):
    return op.neumann_chain(op.inv_diag * b_pad, iters)[0]

@jax.jit
def solve_loop(op, b_pad):
    term0 = op.inv_diag * b_pad
    def step(_, st):
        x, term = st
        term = -op.inv_diag * op.offdiag_matvec(term)
        return x + term, term
    x, _ = jax.lax.fori_loop(0, iters, step, (term0, term0))
    return x

# correctness: residual of chain solution
r, c, v = A.csr.to_coo()
x_c = np.asarray(solve_chain(op, b_pad))
y = np.zeros(n); np.add.at(y, np.asarray(r), np.asarray(v) * x_c[np.asarray(c)])
res = np.linalg.norm(y - b[:n]) / np.linalg.norm(b[:n])
print(f"chain residual after {iters} iters: {res:.2e}")
x_l = np.asarray(solve_loop(op, b_pad))
print(f"chain vs loop max diff: {np.abs(x_c - x_l).max():.2e}")

def timeit(fn, R_s=8, R_l=40):
    def chain_of(R):
        @jax.jit
        def f(op, bp):
            def body(i, v):
                return fn.__wrapped__(op, bp * (1.0 + 1e-9 * i) + 1e-9 * v)
            return jax.lax.fori_loop(0, R, body, bp)
        return f
    fs, fl = chain_of(R_s), chain_of(R_l)
    float(np.asarray(jax.device_get(fs(op, b_pad)))[0]); float(np.asarray(jax.device_get(fl(op, b_pad)))[0])
    ts, tl = [], []
    for i in range(4):
        t0 = time.perf_counter(); float(np.asarray(jax.device_get(fs(op, b_pad)))[0]); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(np.asarray(jax.device_get(fl(op, b_pad)))[0]); tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (R_l - R_s) * 1e3

ms_chain = timeit(solve_chain)
print(f"chain solve ({iters} it): {ms_chain:.3f} ms  ({ms_chain*1e3/iters:.1f} us/iter)")
ms_loop = timeit(solve_loop)
print(f"loop  solve ({iters} it): {ms_loop:.3f} ms  ({ms_loop*1e3/iters:.1f} us/iter)")
