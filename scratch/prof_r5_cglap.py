"""Chain PCG vs multi-launch PCG on a 2D 5-point Laplacian (316x316 ~ 100k):
the genuinely ill-conditioned regime (no diagonal dominance margin)."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from sublinear_tpu.matrix import Matrix
from sublinear_tpu.solvers.cg import _cg_run, _cg_chain_run
from sublinear_tpu.solvers import base as sbase

side = int(sys.argv[1]) if len(sys.argv) > 1 else 316
n = side * side
idx = np.arange(n).reshape(side, side)
rows, cols, vals = [], [], []
for dr, dc in ((0, 1), (1, 0)):
    a = idx[:side - dr, :side - dc].ravel()
    b_ = idx[dr:, dc:].ravel()
    rows += [a, b_]; cols += [b_, a]; vals += [np.full(len(a), -1.0)] * 2
rows = np.concatenate(rows + [np.arange(n)])
cols = np.concatenate(cols + [np.arange(n)])
vals = np.concatenate(vals + [np.full(n, 4.0)])
A = Matrix.from_coo(rows, cols, vals, (n, n), prefer="xbar")
op = A.op()
print(f"laplacian2d n={n}: chain={op.chain_ready} P={op.P} Bd={op.Bd}", file=sys.stderr)
b = slt.rhs(n, seed=7)
bf = np.zeros(op.m_pad); bf[:n] = b
b_pad = jnp.asarray(bf, jnp.float32)
thr = sbase.threshold_for(b, slt.SolverOptions(epsilon=1e-6))
x0 = jnp.zeros_like(b_pad)
mi = jnp.int32(3000)

for nm, f in (("multi-launch PCG",
               lambda bs: _cg_run(op, bs, x0, thr, mi, True)[:3]),
              ("chain PCG",
               lambda bs: _cg_chain_run(op, bs, x0, thr, mi, 16))):
    @jax.jit
    def run(bs, f=f):
        x, k, res = f(bs)
        return x, k, res
    o = run(b_pad); float(np.asarray(jax.device_get(o[0]))[0])
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        o = run(b_pad * (1.0 + 0.01 * i))
        float(np.asarray(jax.device_get(o[0]))[0])
        ts.append(time.perf_counter() - t0)
    k = int(jax.device_get(o[1])); res = float(jax.device_get(o[2]))
    print(f"{nm:>18}: {min(ts)*1e3:9.2f} ms/solve  iters={k}  "
          f"rel_res={res/np.linalg.norm(b):.2e}")
