"""Pallas fused-kernel tests (interpret mode on CPU) vs library solvers."""
import numpy as np
import pytest

import jax.numpy as jnp

import sublinear_tpu as slt
from sublinear_tpu.ops.pallas_kernels import (
    dense_jacobi_fused,
    dense_neumann_fused,
    dense_power_fused,
    fused_supported,
)


def setup_system(n=96, seed=0):
    A = slt.generate("random-sparse", n, seed=seed, density=0.1)
    b = slt.rhs(n, seed=seed)
    op = A.op()
    assert fused_supported(op)
    b_pad = np.zeros((op.n_pad, 1))
    b_pad[:n, 0] = b
    return A, b, op, jnp.asarray(b_pad, op.dtype)


def test_fused_neumann_matches_oracle():
    A, b, op, b_col = setup_system()
    x = dense_neumann_fused(
        op.data, op.diag[:, None], op.inv_diag[:, None], b_col, jnp.zeros_like(b_col), iters=60
    )
    x = np.asarray(x)[: A.shape[0], 0]
    x_ref = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-3, atol=1e-4)


def test_fused_neumann_warm_restart():
    A, b, op, b_col = setup_system(seed=3)
    x1 = dense_neumann_fused(
        op.data, op.diag[:, None], op.inv_diag[:, None], b_col, jnp.zeros_like(b_col), iters=8
    )
    x2 = dense_neumann_fused(op.data, op.diag[:, None], op.inv_diag[:, None], b_col, x1, iters=40)
    x_ref = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(np.asarray(x2)[: A.shape[0], 0], x_ref, rtol=1e-3, atol=1e-4)


def test_fused_jacobi_matches_oracle():
    A, b, op, b_col = setup_system(seed=1)
    x = dense_jacobi_fused(
        op.data, op.diag[:, None], op.inv_diag[:, None], b_col, jnp.zeros_like(b_col), iters=80
    )
    x_ref = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(np.asarray(x)[: A.shape[0], 0], x_ref, rtol=1e-3, atol=1e-4)


def test_fused_neumann_batched_rhs():
    A, b, op, _ = setup_system(seed=2)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    B = rng.normal(size=(n, 4))
    B_pad = np.zeros((op.n_pad, 4))
    B_pad[:n] = B
    X = dense_neumann_fused(
        op.data, op.diag[:, None], op.inv_diag[:, None],
        jnp.asarray(B_pad, op.dtype), jnp.zeros((op.n_pad, 4), op.dtype), iters=60,
    )
    X_ref = np.linalg.solve(A.to_dense(), B)
    np.testing.assert_allclose(np.asarray(X)[:n], X_ref, rtol=1e-3, atol=1e-4)


def test_fused_power_pagerank():
    n = 48
    rng = np.random.default_rng(4)
    dense = (rng.random((n, n)) < 0.15).astype(float)
    np.fill_diagonal(dense, 0.0)
    A = slt.Matrix.from_dense(dense)
    from sublinear_tpu.graph.pagerank import _transition_matrix, pagerank

    PT = _transition_matrix(A)
    op = PT.op()
    v = np.zeros((op.n_pad, 1))
    v[:n, 0] = 1.0 / n
    out_deg = dense.sum(axis=1)
    dang = np.zeros((op.n_pad, 1))
    dang[:n, 0] = (out_deg == 0).astype(float)
    x = dense_power_fused(op.data, jnp.asarray(v, op.dtype), jnp.asarray(dang, op.dtype),
                          0.85, iters=80)
    x = np.asarray(x)[:n, 0]
    x = x / x.sum()
    ref = pagerank(A, epsilon=1e-10)
    np.testing.assert_allclose(x, ref.scores, atol=1e-5)


def test_fused_not_supported_for_large():
    A = slt.generate("random-sparse", 3000, seed=5, density=0.001)
    assert not fused_supported(A.op())


def test_fused_bf16x3_matches_oracle():
    from sublinear_tpu.ops.pallas_kernels import dense_neumann_fused_bf16x3, split_bf16

    A, b, op, b_col = setup_system(seed=7)
    ah, al = split_bf16(op.data)
    x = dense_neumann_fused_bf16x3(
        ah, al, op.diag[:, None], op.inv_diag[:, None], b_col, jnp.zeros_like(b_col), iters=60
    )
    x_ref = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(np.asarray(x)[: A.shape[0], 0], x_ref, rtol=2e-3, atol=2e-4)


def test_solve_neumann_fused_driver():
    from sublinear_tpu.solvers.fused import solve_neumann_fused

    A = slt.generate("random-sparse", 200, seed=9, density=0.05)
    b = slt.rhs(200, seed=9)
    r = solve_neumann_fused(A, b, slt.SolverOptions(epsilon=1e-6))
    assert r.converged
    assert r.method.startswith("neumann-fused")
    x_ref = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(r.solution, x_ref, rtol=1e-3, atol=1e-4)


def test_solve_neumann_fused_bf16x3_driver():
    from sublinear_tpu.ops import pallas_kernels as pk
    from sublinear_tpu.solvers.fused import solve_neumann_fused

    # force the bf16x3 variant by dropping the HIGHEST cutoff
    old = pk.FUSED_HIGHEST_MAX_NPAD
    pk.FUSED_HIGHEST_MAX_NPAD = 0
    try:
        A = slt.generate("random-sparse", 150, seed=11, density=0.05)
        b = slt.rhs(150, seed=11)
        r = solve_neumann_fused(A, b, slt.SolverOptions(epsilon=1e-3))
        assert r.converged
        assert r.method == "neumann-fused-bf16x3"
        # tight tolerances route back to the full-f32 XLA path
        r2 = solve_neumann_fused(A, b, slt.SolverOptions(epsilon=1e-6))
        assert r2.method == "neumann"
    finally:
        pk.FUSED_HIGHEST_MAX_NPAD = old
