"""Random-walk Monte-Carlo solver — fully vectorized walkers on the VPU.

Reference semantics: per-coordinate absorption walks over the transition
matrix p_jk = -a_jk/a_jj with numWalks = max(100, 1/eps^2)
(/root/reference/src/core/solver.ts:278-432) and the ChaCha8-seeded
RandomWalkEngine with antithetic variance reduction
(/root/reference/src/solver/random_walk.rs:65-230).

TPU re-design (per SURVEY.md §2.7): the reference walks one coordinate at a
time in a scalar loop; here ALL walkers for ALL requested coordinates advance
in lockstep as lane-parallel vectors.  We use the *accumulation* estimator of
the Neumann series x = sum_t M^t c (M = -D^-1 R, c = D^-1 b):

    acc += w_t * c[pos_t],   w_{t+1} = w_t * sign(m) * S[pos_t]

with the next node sampled from the row CDF of |M| (probability |m_jk|/S_j,
so the importance weight is exactly sign * S_j).  Since S_j < 1 for strictly
DD rows, weights decay geometrically; walks stop when |w| < w_min or at
max_walk_length.  Statistics match the reference (same expectation); streams
differ (threefry vs ChaCha8) as SURVEY.md §7 allows.  Antithetic pairs share
u <-> 1-u.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..config import resolve_dtype
from ..matrix import Matrix
from ..types import SolverOptions, SolverResult
from . import base

WALK_CAP = 10_000  # cap on reference's 1/eps^2 walk-count rule


def default_num_walks(options: SolverOptions) -> int:
    if options.num_walks is not None:
        return int(options.num_walks)
    return int(max(100, min(1.0 / (options.epsilon**2), WALK_CAP)))


class SamplingTables:
    """Row-major CDF sampling tables for the iteration matrix M = -D^-1 R."""

    def __init__(self, cols, cdf, sign, S, n_pad):
        self.cols = cols  # (n_pad, K) int32
        self.cdf = cdf    # (n_pad, K) cumulative probabilities in [0, 1]
        self.sign = sign  # (n_pad, K) ±1
        self.S = S        # (n_pad,) row l1 mass of M
        self.n_pad = n_pad


_TABLE_CACHE: dict = {}


def sampling_tables(matrix: Matrix, dtype=None) -> SamplingTables:
    key = (matrix.uid, str(resolve_dtype(dtype)))
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    dt = resolve_dtype(dtype)
    csr = matrix.csr
    n = csr.shape[0]
    op = matrix.op(dtype)
    n_pad = op.n_pad

    rows = csr.row_of_entry()
    diag = csr.diagonal_vector()
    off = csr.indices != rows
    o_rows, o_cols, o_vals = rows[off], csr.indices[off], csr.data[off]
    m_vals = -o_vals / diag[o_rows]

    row_cnt = np.zeros(n, dtype=np.int64)
    np.add.at(row_cnt, o_rows, 1)
    K = max(int(row_cnt.max()) if row_cnt.size else 1, 1)

    pos = np.zeros(o_rows.size, dtype=np.int64)
    # position of each entry within its row (entries are in CSR order)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_cnt, out=starts[1:])
    pos = np.arange(o_rows.size) - starts[o_rows]

    absm = np.zeros((n_pad, K))
    sign = np.ones((n_pad, K))
    cols = np.zeros((n_pad, K), dtype=np.int32)
    absm[o_rows, pos] = np.abs(m_vals)
    sign[o_rows, pos] = np.where(m_vals >= 0, 1.0, -1.0)
    cols[o_rows, pos] = o_cols

    S = absm.sum(axis=1)
    safe = np.where(S > 0, S, 1.0)
    cdf = np.cumsum(absm / safe[:, None], axis=1)
    cdf[:, -1] = 1.0 + 1e-6  # guard: u==1 still lands in the last slot

    tables = SamplingTables(
        jnp.asarray(cols), jnp.asarray(cdf, dt), jnp.asarray(sign, dt), jnp.asarray(S, dt), n_pad
    )
    _TABLE_CACHE[key] = tables
    return tables


@functools.partial(jax.jit, static_argnames=("max_len", "antithetic"))
def _walk_batch(cols, cdf, sign, S, c, starts, seed, max_len, antithetic):
    """Advance all walkers to termination.  starts: (W,) int32 start nodes.
    Returns per-walker accumulated estimates (W,)."""
    W = starts.shape[0]
    dt = c.dtype
    w_min = jnp.asarray(1e-4, dt)

    def cond(carry):
        pos, w, acc, t, key = carry
        return (t < max_len) & jnp.any(jnp.abs(w) > w_min)

    def body(carry):
        pos, w, acc, t, key = carry
        acc = acc + w * jnp.take(c, pos)
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (W,), dt)
        if antithetic:
            half = W // 2
            u = jnp.concatenate([u[:half], 1.0 - u[:half], u[2 * half:]])
        row_cdf = jnp.take(cdf, pos, axis=0)          # (W, K)
        slot = jnp.sum(u[:, None] >= row_cdf, axis=1)  # searchsorted on VPU
        slot = jnp.minimum(slot, row_cdf.shape[1] - 1)
        s_here = jnp.take(S, pos)
        sgn = jnp.take_along_axis(jnp.take(sign, pos, axis=0), slot[:, None], axis=1)[:, 0]
        nxt = jnp.take_along_axis(jnp.take(cols, pos, axis=0), slot[:, None], axis=1)[:, 0]
        w = w * sgn * s_here
        w = jnp.where(s_here > 0, w, 0.0)  # dangling rows terminate
        pos = jnp.where(s_here > 0, nxt, pos)
        return pos, w, acc, t + 1, key

    key = jax.random.PRNGKey(seed)
    carry0 = (starts, jnp.ones(W, dt), jnp.zeros(W, dt), jnp.int32(0), key)
    pos, w, acc, t, _ = jax.lax.while_loop(cond, body, carry0)
    return acc, t


def walk_estimate(matrix: Matrix, b, start_nodes, options: SolverOptions):
    """MC estimates of x[start_nodes]; returns (estimates, variance, steps)."""
    dt = resolve_dtype(options.dtype)
    tables = sampling_tables(matrix, options.dtype)
    op = matrix.op(options.dtype)
    b_pad = matrix.pad_vector(b, options.dtype)
    c = op.inv_diag * b_pad

    start_nodes = np.asarray(start_nodes, dtype=np.int32).reshape(-1)
    W = default_num_walks(options)
    starts = jnp.asarray(np.repeat(start_nodes, W))
    anti = options.variance_reduction == "antithetic"
    acc, t = _walk_batch(
        tables.cols, tables.cdf, tables.sign, tables.S, c, starts,
        int(options.seed), int(min(options.max_walk_length, 512)), anti,
    )
    acc = np.asarray(jax.device_get(acc), dtype=np.float64).reshape(start_nodes.size, W)
    est = acc.mean(axis=1)
    var = acc.var(axis=1, ddof=1) if W > 1 else np.zeros_like(est)
    return est, var, int(jax.device_get(t))


def solve_random_walk(matrix: Matrix, b, options: SolverOptions, raise_on_fail: bool = True) -> SolverResult:
    n = matrix.shape[0]
    threshold = base.threshold_for(b, options)
    with base.SolveTimer() as t:
        est, var, steps = walk_estimate(matrix, b, np.arange(n), options)
    res = float(np.linalg.norm(matrix.csr.matvec(est) - np.asarray(b, dtype=np.float64)))
    result = SolverResult(
        solution=est,
        iterations=steps,
        residual=res,
        converged=res <= threshold,
        method="random-walk",
        compute_time_ms=t.ms,
    )
    return base.check_outcome(result, threshold, options, raise_on_fail)
