"""Distributed solvers: row-partitioned SpMV over a device mesh.

The TPU-native replacement for the reference's single-node scale story
(SURVEY.md §2.7, §5.8): A's rows are partitioned across the ``rows`` mesh
axis, batched RHS across ``batch``.  Two execution modes:

  1. ``auto`` (GSPMD): operator arrays are placed with NamedShardings and the
     SAME jitted solver programs run unchanged — XLA's SPMD partitioner
     inserts the all-gathers/psums.  This is the idiomatic pjit path and
     works for every solver in the library.
  2. ``explicit`` (shard_map): a hand-scheduled CG where the search direction
     is re-replicated with one ``all_gather`` per iteration (the halo
     exchange) and dot products are ``psum``-reduced over shards — the
     scheme SURVEY.md §5.7/§5.8 calls for, with collectives riding ICI.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import LANE, round_up
from ..formats import ell as _ell
from ..matrix import Matrix
from ..solvers import base
from ..types import SolverOptions, SolverResult
from . import mesh as mesh_mod
from .mesh import BATCH, ROWS


def shard_operator(matrix: Matrix, mesh: Mesh, dtype=None) -> _ell.EllOperator:
    """Build an ELL operator padded to the mesh row-count and place its arrays.

    slot_cap is forced to the max row nnz (no COO tail) so every shard's data
    is self-contained under a plain row partition."""
    n_rows_axis = mesh.shape[ROWS]
    csr = matrix.csr
    n = csr.shape[0]
    row_nnz = csr.row_nnz()
    K = max(int(row_nnz.max()) if row_nnz.size else 1, 1)
    op = _ell.ell_from_csr(csr, dtype, slot_cap=K)

    target = round_up(max(n, 1), LANE * n_rows_axis)
    if op.n_pad != target:
        # re-pad to a shard-divisible width
        pad = target - op.n_pad

        def pad_row_axis(a):
            return jnp.pad(a, ((0, 0), (0, pad)))

        op = _ell.EllOperator(
            pad_row_axis(op.values), pad_row_axis(op.cols),
            op.tail_vals, op.tail_rows, op.tail_cols,
            jnp.pad(op.diag, (0, pad)), jnp.pad(op.inv_diag, (0, pad)),
            shape=op.shape, n_pad=target, m_pad=target,
        )

    ell_sh = NamedSharding(mesh, P(None, ROWS))
    vec_sh = NamedSharding(mesh, P(ROWS))
    return _ell.EllOperator(
        jax.device_put(op.values, ell_sh),
        jax.device_put(op.cols, ell_sh),
        op.tail_vals, op.tail_rows, op.tail_cols,
        jax.device_put(op.diag, vec_sh),
        jax.device_put(op.inv_diag, vec_sh),
        shape=op.shape, n_pad=op.n_pad, m_pad=op.m_pad,
    )


# ------------------------------------------------------------------ explicit

def _explicit_cg_factory(mesh: Mesh):
    """shard_map CG: sharded residual/direction, one all_gather per iteration."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, ROWS), P(None, ROWS), P(ROWS),  # values, cols, inv_diag
            P(ROWS), P(),                            # b_local, x0_full
            P(), P(),                                # threshold, max_iters
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def cg_shard(vals_l, cols_l, invd_l, b_l, x0_full, threshold, max_iters):
        from ..ops import spmv

        shard = b_l.shape[0]
        idx = jax.lax.axis_index(ROWS) * shard

        def local(v_full):
            return jax.lax.dynamic_slice(v_full, (idx,), (shard,))

        def pdot(a, b):
            return jax.lax.psum(jnp.vdot(a, b), ROWS)

        # r_local = b_local - (A x0)_local ; matvec over the replicated x
        r_l = b_l - spmv.ell_matvec(vals_l, cols_l, x0_full)
        z_l = invd_l * r_l
        p_full = jax.lax.all_gather(z_l, ROWS, tiled=True)
        rz0 = pdot(r_l, z_l)
        res0 = jnp.sqrt(pdot(r_l, r_l))

        def cond(carry):
            x, r_l, p_full, rz, k, res = carry
            return (res > threshold) & (k < max_iters) & jnp.isfinite(res) & (res < base.HUGE_RES)

        def body(carry):
            x, r_l, p_full, rz, k, _ = carry
            Ap_l = spmv.ell_matvec(vals_l, cols_l, p_full)   # local rows, ICI-free
            pAp = pdot(local(p_full), Ap_l)
            alpha = rz / jnp.maximum(pAp, 1e-30)
            x = x + alpha * p_full                            # replicated update
            r_l = r_l - alpha * Ap_l
            z_l = invd_l * r_l
            rz_new = pdot(r_l, z_l)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p_l = z_l + beta * local(p_full)
            p_full = jax.lax.all_gather(p_l, ROWS, tiled=True)  # halo exchange
            res = jnp.sqrt(pdot(r_l, r_l))
            return x, r_l, p_full, rz_new, k + 1, res

        carry0 = (x0_full, r_l, p_full, rz0, jnp.int32(0), res0)
        x, r_l, p_full, rz, k, res = jax.lax.while_loop(cond, body, carry0)
        return x, k, res

    return jax.jit(cg_shard)


from ..utils.lru import LRUCache

# keyed by mesh signature (not matrix): a handful of program factories
_EXPLICIT_CACHE = LRUCache(maxsize=8)


def solve_cg_sharded(
    matrix: Matrix,
    b,
    mesh: Optional[Mesh] = None,
    options: Optional[SolverOptions] = None,
    mode: str = "explicit",
    raise_on_fail: bool = True,
) -> SolverResult:
    """Distributed (preconditioned) CG over a row-partitioned operator."""
    options = options or SolverOptions()
    mesh = mesh or mesh_mod.make_mesh()
    op = shard_operator(matrix, mesh, options.dtype)
    n = matrix.shape[0]
    b_full = _ell.pad_vector(np.asarray(b, dtype=np.float64), op.n_pad, op.dtype)
    b_local = jax.device_put(b_full, NamedSharding(mesh, P(ROWS)))
    x0_np = np.zeros(op.n_pad) if options.x0 is None else np.pad(
        np.asarray(options.x0, dtype=np.float64), (0, op.n_pad - n)
    )
    x0 = jax.device_put(jnp.asarray(x0_np, op.dtype), NamedSharding(mesh, P()))
    threshold = base.threshold_for(b, options)

    if mode == "auto":
        from ..solvers.cg import _cg_run

        with base.SolveTimer() as t:
            x, k, res, _ = _cg_run(op, b_local, x0, threshold, jnp.int32(options.max_iterations), True)
            jax.block_until_ready(x)
    else:
        key = (tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat), "cg")
        fn = _EXPLICIT_CACHE.get(key)
        if fn is None:
            fn = _EXPLICIT_CACHE.put(key, _explicit_cg_factory(mesh))
        with base.SolveTimer() as t:
            x, k, res = fn(
                op.values, op.cols, op.inv_diag, b_local, x0,
                jnp.asarray(threshold, op.dtype), jnp.int32(options.max_iterations),
            )
            jax.block_until_ready(x)

    result = base.finalize(
        matrix, x, k, res, f"cg-sharded-{mode}", options, t.ms,
        matvec_count=int(jax.device_get(k)) + 1,
    )
    return base.check_outcome(result, threshold, options, raise_on_fail)


def _explicit_neumann_factory(mesh: Mesh):
    """shard_map Neumann series: the term vector stays row-sharded; one
    all_gather re-replicates it before each local SpMV (the halo exchange),
    and the residual check psum-reduces partial norms — the overlapped
    halo-exchange schedule of SURVEY.md §5.7 for the series iteration."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, ROWS), P(None, ROWS), P(ROWS), P(ROWS),  # values, cols, diag, inv_diag
            P(ROWS), P(),                                     # b_local, x0_full
            P(), P(), P(),                                    # threshold, max_iters, check_every
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def neumann_shard(vals_l, cols_l, diag_l, invd_l, b_l, x0_full, threshold, max_iters, check_every):
        from ..ops import spmv

        shard = b_l.shape[0]
        idx = jax.lax.axis_index(ROWS) * shard

        def local(v_full):
            return jax.lax.dynamic_slice(v_full, (idx,), (shard,))

        def pnorm(v_l):
            return jnp.sqrt(jax.lax.psum(jnp.vdot(v_l, v_l), ROWS))

        r0_l = b_l - spmv.ell_matvec(vals_l, cols_l, x0_full)
        term0_l = invd_l * r0_l
        x_l = local(x0_full) + term0_l

        def cond(carry):
            x_l, term_l, k, res = carry
            return (res > threshold) & (k < max_iters) & jnp.isfinite(res) & (res < base.HUGE_RES)

        def body(carry):
            x_l, term_l, k, _ = carry

            def inner(i, st):
                x_l, term_l = st
                term_full = jax.lax.all_gather(term_l, ROWS, tiled=True)  # halo
                at_l = spmv.ell_matvec(vals_l, cols_l, term_full) - diag_l * local(term_full)
                term_l = -invd_l * at_l
                return x_l + term_l, term_l

            x_l, term_l = jax.lax.fori_loop(0, check_every, inner, (x_l, term_l))
            x_full = jax.lax.all_gather(x_l, ROWS, tiled=True)
            res = pnorm(spmv.ell_matvec(vals_l, cols_l, x_full) - b_l)
            return x_l, term_l, k + check_every, res

        x_full0 = jax.lax.all_gather(x_l, ROWS, tiled=True)
        res0 = pnorm(spmv.ell_matvec(vals_l, cols_l, x_full0) - b_l)
        x_l, term_l, k, res = jax.lax.while_loop(
            cond, body, (x_l, term0_l, jnp.int32(0), res0)
        )
        return jax.lax.all_gather(x_l, ROWS, tiled=True), k, res

    return jax.jit(neumann_shard)


def solve_neumann_sharded(
    matrix: Matrix,
    b,
    mesh: Optional[Mesh] = None,
    options: Optional[SolverOptions] = None,
    raise_on_fail: bool = True,
) -> SolverResult:
    """Distributed Neumann series over a row-partitioned operator."""
    options = options or SolverOptions()
    mesh = mesh or mesh_mod.make_mesh()
    op = shard_operator(matrix, mesh, options.dtype)
    n = matrix.shape[0]
    b_full = _ell.pad_vector(np.asarray(b, dtype=np.float64), op.n_pad, op.dtype)
    b_local = jax.device_put(b_full, NamedSharding(mesh, P(ROWS)))
    x0_np = np.zeros(op.n_pad) if options.x0 is None else np.pad(
        np.asarray(options.x0, dtype=np.float64), (0, op.n_pad - n)
    )
    x0 = jax.device_put(jnp.asarray(x0_np, op.dtype), NamedSharding(mesh, P()))
    threshold = base.threshold_for(b, options)

    key = (tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat), "neumann")
    fn = _EXPLICIT_CACHE.get(key)
    if fn is None:
        fn = _EXPLICIT_CACHE.put(key, _explicit_neumann_factory(mesh))
    with base.SolveTimer() as t:
        x, k, res = fn(
            op.values, op.cols, op.diag, op.inv_diag, b_local, x0,
            jnp.asarray(threshold, op.dtype), jnp.int32(options.max_iterations),
            jnp.int32(options.check_every),
        )
        jax.block_until_ready(x)
    result = base.finalize(
        matrix, x, k, res, "neumann-sharded", options, t.ms,
        matvec_count=int(jax.device_get(k)),
    )
    return base.check_outcome(result, threshold, options, raise_on_fail)


# ------------------------------------------------------------------ batched

@functools.partial(jax.jit, static_argnames=("precondition",))
def _cg_batch_run(op, B, X0, threshold, max_iters, precondition):
    """CG over a block of RHS columns; converges on the max column residual.
    Replaces the reference's sequential batch loop (tools/solver.ts:291-321)."""
    inv_d = op.inv_diag

    def M(V):
        return inv_d[:, None] * V if precondition else V

    R0 = B - op.matmat(X0)
    Z0 = M(R0)
    P0 = Z0
    rz0 = jnp.sum(R0 * Z0, axis=0)

    def col_res(R):
        return jnp.sqrt(jnp.sum(R * R, axis=0))

    def cond(carry):
        X, R, Pd, rz, k, res = carry
        return (res > threshold) & (k < max_iters) & jnp.isfinite(res)

    def body(carry):
        X, R, Pd, rz, k, _ = carry
        AP = op.matmat(Pd)
        pAp = jnp.sum(Pd * AP, axis=0)
        alpha = rz / jnp.maximum(pAp, 1e-30)
        X = X + alpha[None, :] * Pd
        R = R - alpha[None, :] * AP
        Z = M(R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        Pd = Z + beta[None, :] * Pd
        return X, R, Pd, rz_new, k + 1, jnp.max(col_res(R))

    carry0 = (X0, R0, P0, rz0, jnp.int32(0), jnp.max(col_res(R0)))
    X, R, Pd, rz, k, res = jax.lax.while_loop(cond, body, carry0)
    return X, k, col_res(R)


@jax.jit
def _neumann_batch_run(op, B, X0, threshold, max_iters):
    """Batched Neumann series over a RHS block — the DD-convergent batch
    driver for asymmetric systems where plain CG has no guarantee."""
    inv_d = op.inv_diag
    diag = op.diag

    def col_res(R):
        return jnp.sqrt(jnp.sum(R * R, axis=0))

    R0 = B - op.matmat(X0)
    T0 = inv_d[:, None] * R0

    def cond(carry):
        X, T, k, res = carry
        return (res > threshold) & (k < max_iters) & jnp.isfinite(res)

    def body(carry):
        X, T, k, _ = carry
        AT = op.matmat(T)
        T = -inv_d[:, None] * (AT - diag[:, None] * T)
        X = X + T
        res = jnp.max(col_res(B - op.matmat(X)))
        return X, T, k + 1, res

    X0n = X0 + T0
    carry0 = (X0n, T0, jnp.int32(1), jnp.max(col_res(B - op.matmat(X0n))))
    X, T, k, _ = jax.lax.while_loop(cond, body, carry0)
    R = B - op.matmat(X)
    return X, k, col_res(R)


def solve_batch(
    matrix: Matrix,
    B,
    options: Optional[SolverOptions] = None,
    mesh: Optional[Mesh] = None,
    raise_on_fail: bool = False,
    method: str = "auto",
):
    """Solve A X = B for many RHS at once (B: (n, nrhs)).  With a mesh, the
    RHS block is sharded over the ``batch`` axis and rows over ``rows``.

    ``method``: 'cg' | 'neumann' | 'auto' (CG when symmetric, else the
    DD-convergent batched Neumann series)."""
    options = options or SolverOptions()
    n = matrix.shape[0]
    B = np.asarray(B, dtype=np.float64)
    if B.ndim != 2 or B.shape[0] != n:
        from ..errors import DimensionMismatchError

        raise DimensionMismatchError(f"batch RHS must be (n, k), got {B.shape}")

    nrhs = B.shape[1]
    # ELL gathers charge per index with payload amortization from >=8-float
    # rows (ARCHITECTURE.md): pad tiny batches up to 8 columns for free speed
    from ..formats.ell import EllOperator

    if mesh is not None:
        op = shard_operator(matrix, mesh, options.dtype)
        B_width = nrhs
        B_pad = np.zeros((op.n_pad, B_width))
        B_pad[:n] = B
        B_dev = jax.device_put(
            jnp.asarray(B_pad, op.dtype), NamedSharding(mesh, P(None, BATCH))
        )
    else:
        op = matrix.op(options.dtype, batch=True)
        B_width = max(nrhs, 8) if isinstance(op, EllOperator) else nrhs
        B_pad = np.zeros((op.n_pad, B_width))
        B_pad[:n, :nrhs] = B
        B_dev = jnp.asarray(B_pad, op.dtype)

    X0 = jnp.zeros_like(B_dev)
    norms = np.linalg.norm(B, axis=0)
    threshold = float(options.epsilon) * max(float(norms.max()), 1e-30) if options.convergence == "relative" else float(options.epsilon)

    if method == "auto":
        from ..analysis import analyze

        a = analyze(matrix, estimate_condition=False)
        method = "cg" if a.is_symmetric else (
            "neumann" if a.is_diagonally_dominant else "cg"
        )
    with base.SolveTimer() as t:
        if method == "neumann":
            X, k, col_res = _neumann_batch_run(op, B_dev, X0, threshold, jnp.int32(options.max_iterations))
        else:
            X, k, col_res = _cg_batch_run(op, B_dev, X0, threshold, jnp.int32(options.max_iterations), True)
        jax.block_until_ready(X)

    X_host = np.asarray(jax.device_get(X), dtype=np.float64)[:n]
    res = np.asarray(jax.device_get(col_res), dtype=np.float64)
    results = []
    for j in range(B.shape[1]):
        results.append(
            SolverResult(
                solution=X_host[:, j],
                iterations=int(jax.device_get(k)),
                residual=float(res[j]),
                converged=bool(res[j] <= threshold * 1.0000001),
                method=f"{method}-batch",
                compute_time_ms=t.ms,
            )
        )
    return results
