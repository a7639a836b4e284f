"""Crossbar-routed SpMV kernel (ops/xbar.py) — correctness vs NumPy oracle.

On CPU the Pallas gathers run in interpret mode; on TPU they lower to
tpu.dynamic_gather.  Reference hot-kernel parity target:
/root/reference/src/ultra_fast.rs:49-97 (unrolled CSR matvec).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sublinear_tpu.matrix import Matrix
from sublinear_tpu.ops.xbar import XbarOperator, pack_xbar
from sublinear_tpu.types import SolverOptions
from sublinear_tpu.solvers.dispatch import solve


def _random_coo(n, deg, seed=0, rect_m=None):
    m = rect_m or n
    rng = np.random.default_rng(seed)
    cnt = n * deg
    r = rng.integers(0, n, cnt)
    c = rng.integers(0, m, cnt)
    v = rng.uniform(-1, 1, cnt)
    key = r.astype(np.int64) * m + c
    _, ui = np.unique(key, return_index=True)
    return r[ui], c[ui], v[ui]


def _dd_matrix(n, deg=6, seed=0):
    r, c, v = _random_coo(n, deg, seed)
    off = r != c
    r, c, v = r[off], c[off], v[off]
    diag = np.zeros(n)
    np.add.at(diag, r, np.abs(v))
    rows = np.r_[r, np.arange(n)]
    cols = np.r_[c, np.arange(n)]
    vals = np.r_[v, diag * 1.5 + 1.0]
    return rows, cols, vals


def _dense_of(rows, cols, vals, shape):
    D = np.zeros(shape)
    np.add.at(D, (rows, cols), vals)
    return D


class TestXbarMatvec:
    def test_matches_oracle(self):
        n = 700
        rows, cols, vals = _dd_matrix(n, deg=6, seed=1)
        op = pack_xbar(rows, cols, vals, (n, n))
        assert op is not None and isinstance(op, XbarOperator)
        rng = np.random.default_rng(2)
        x = rng.standard_normal(n)
        x_pad = np.zeros(op.m_pad); x_pad[:n] = x
        y = np.asarray(jax.jit(op.matvec)(jnp.asarray(x_pad, jnp.float32)))[:n]
        y_ref = _dense_of(rows, cols, vals, (n, n)) @ x
        np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)

    def test_rectangular(self):
        n, m = 300, 900
        rng = np.random.default_rng(3)
        rows, cols, vals = _random_coo(n, 5, seed=3, rect_m=m)
        op = pack_xbar(rows, cols, vals, (n, m))
        assert op is not None
        x = rng.standard_normal(m)
        x_pad = np.zeros(op.m_pad); x_pad[:m] = x
        y = np.asarray(jax.jit(op.matvec)(jnp.asarray(x_pad, jnp.float32)))[:n]
        y_ref = _dense_of(rows, cols, vals, (n, m)) @ x
        np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)

    def test_tail_entries_counted(self):
        # hub column: one col receives a huge count -> forces COO tail use
        n = 400
        rows, cols, vals = _dd_matrix(n, deg=4, seed=4)
        hub_r = np.arange(n)
        hub = (hub_r, np.zeros(n, np.int64), np.full(n, 0.01))
        rows = np.r_[rows, hub[0]]; cols = np.r_[cols, hub[1]]
        vals = np.r_[vals, hub[2]]
        op = pack_xbar(rows, cols, vals, (n, n))
        assert op is not None
        x = np.random.default_rng(5).standard_normal(n)
        x_pad = np.zeros(op.m_pad); x_pad[:n] = x
        y = np.asarray(jax.jit(op.matvec)(jnp.asarray(x_pad, jnp.float32)))[:n]
        y_ref = _dense_of(rows, cols, vals, (n, n)) @ x
        np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)

    def test_matmat_scan_matches(self):
        n = 300
        rows, cols, vals = _dd_matrix(n, deg=4, seed=6)
        op = pack_xbar(rows, cols, vals, (n, n))
        X = np.random.default_rng(7).standard_normal((n, 3))
        X_pad = np.zeros((op.m_pad, 3)); X_pad[:n] = X
        Y = np.asarray(jax.jit(op.matmat)(jnp.asarray(X_pad, jnp.float32)))[:n]
        Y_ref = _dense_of(rows, cols, vals, (n, n)) @ X
        np.testing.assert_allclose(Y, Y_ref, rtol=2e-5, atol=2e-5)


class TestXbarThroughMatrix:
    def test_prefer_xbar_solve(self):
        n = 600
        rows, cols, vals = _dd_matrix(n, deg=5, seed=8)
        A = Matrix.from_coo(rows, cols, vals, (n, n), prefer="xbar")
        from sublinear_tpu.ops.xbar import XbarOperator as XO
        assert isinstance(A.op(), XO)
        b = np.random.default_rng(9).standard_normal(n)
        res = solve(A, b, SolverOptions(method="neumann", epsilon=1e-5))
        assert res.converged
        x = np.asarray(res.solution)
        r = _dense_of(rows, cols, vals, (n, n)) @ x - b
        assert np.linalg.norm(r) <= 1e-5 * np.linalg.norm(b) * 1.5

    def test_auto_selection_large_sparse(self):
        # eligibility rule: only large sparse matrices route to xbar
        n = 600
        rows, cols, vals = _dd_matrix(n, deg=5, seed=10)
        A = Matrix.from_coo(rows, cols, vals, (n, n))
        assert A._op_kind() != "xbar"  # too small -> dense

    def test_transpose_op(self):
        n = 500
        rows, cols, vals = _dd_matrix(n, deg=5, seed=11)
        A = Matrix.from_coo(rows, cols, vals, (n, n), prefer="xbar")
        opT = A.op(transpose=True)
        x = np.random.default_rng(12).standard_normal(n)
        x_pad = np.zeros(opT.m_pad); x_pad[:n] = x
        y = np.asarray(jax.jit(opT.matvec)(jnp.asarray(x_pad, jnp.float32)))[:n]
        y_ref = _dense_of(rows, cols, vals, (n, n)).T @ x
        np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)

    def test_batch_flag_returns_non_xbar(self):
        n = 500
        rows, cols, vals = _dd_matrix(n, deg=5, seed=13)
        A = Matrix.from_coo(rows, cols, vals, (n, n), prefer="xbar")
        from sublinear_tpu.ops.xbar import XbarOperator as XO
        # prefer wins even for batch (explicit user choice); the *auto* path
        # must not pick xbar for batch:
        A2 = Matrix.from_coo(rows, cols, vals, (n, n))
        assert not isinstance(A2.op(batch=True), XO)


class TestNeumannChain:
    """The fully-fused Neumann iteration chain (ops/xbar.py::_chain_call)."""

    def _op(self, n=500, seed=3):
        rows, cols, vals = _dd_matrix(n, deg=5, seed=seed)
        A = Matrix.from_coo(rows, cols, vals, (n, n), prefer="xbar")
        return A.op(), rows, cols, vals, n

    def test_chain_matches_explicit_loop(self):
        op, rows, cols, vals, n = self._op()
        if not op.chain_ready:
            pytest.skip("pack not chain-eligible at this size")
        rng = np.random.default_rng(0)
        b = np.zeros(op.m_pad, np.float32)
        b[:n] = rng.standard_normal(n).astype(np.float32)
        b_pad = jnp.asarray(b)
        term0 = op.inv_diag * b_pad
        iters = 9

        x_chain, t_last = jax.jit(
            lambda t: op.neumann_chain(t, iters))(term0)
        x_chain = np.asarray(x_chain)

        # explicit per-matvec recurrence
        x, term = term0, term0
        for _ in range(iters):
            term = -op.inv_diag * op.offdiag_matvec(term)
            x = x + term
        x_ref = np.asarray(x)
        np.testing.assert_allclose(x_chain, x_ref, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_last), np.asarray(term),
                                   rtol=2e-5, atol=1e-7)

    def test_chain_solves_dd_system(self):
        op, rows, cols, vals, n = self._op(seed=5)
        if not op.chain_ready:
            pytest.skip("pack not chain-eligible at this size")
        rng = np.random.default_rng(1)
        b = np.zeros(op.m_pad, np.float32)
        b[:n] = rng.standard_normal(n).astype(np.float32)
        b_pad = jnp.asarray(b)
        x = np.asarray(jax.jit(
            lambda t: op.neumann_chain(t, 25)[0])(op.inv_diag * b_pad))
        D = _dense_of(rows, cols, vals, (n, n))
        res = np.linalg.norm(D @ x[:n] - b[:n]) / np.linalg.norm(b[:n])
        assert res < 1e-5, res

    def test_diag_split_semantics(self):
        op, rows, cols, vals, n = self._op(seed=7)
        assert op.diag_split
        rng = np.random.default_rng(2)
        x = np.zeros(op.m_pad, np.float32)
        x[:n] = rng.standard_normal(n).astype(np.float32)
        xj = jnp.asarray(x)
        D = _dense_of(rows, cols, vals, (n, n))
        y_full = np.asarray(jax.jit(op.matvec)(xj))[:n]
        y_off = np.asarray(jax.jit(op.offdiag_matvec)(xj))[:n]
        np.testing.assert_allclose(y_full, D @ x[:n], rtol=2e-5, atol=2e-5)
        offD = D - np.diag(np.diag(D))
        np.testing.assert_allclose(y_off, offD @ x[:n], rtol=2e-5, atol=2e-5)

    def test_chain_with_residual(self):
        """The residual-identity output: res = -R t_{iters-1} must equal
        b - A x_{iters-1} (the EXACT residual of the penultimate iterate)
        and must upper-bound the residual of the returned x_iters."""
        op, rows, cols, vals, n = self._op(seed=9)
        if not op.chain_ready:
            pytest.skip("pack not chain-eligible at this size")
        rng = np.random.default_rng(3)
        b = np.zeros(op.m_pad, np.float32)
        b[:n] = rng.standard_normal(n).astype(np.float32)
        b_pad = jnp.asarray(b)
        iters = 12
        x, t_last, res = jax.jit(
            lambda bp: op.neumann_chain(op.inv_diag * bp, iters,
                                        with_residual=True))(b_pad)
        # independent penultimate iterate: res == b - A x_{iters-1}
        x_prev, _ = jax.jit(
            lambda bp: op.neumann_chain(op.inv_diag * bp, iters - 1))(b_pad)
        res_ref = np.asarray(b_pad - op.matvec(x_prev))
        np.testing.assert_allclose(np.asarray(res)[:n], res_ref[:n],
                                   rtol=2e-5, atol=1e-6)
        # and it bounds the returned iterate's true residual
        res_final = np.linalg.norm(np.asarray(b_pad - op.matvec(x))[:n])
        assert res_final <= np.linalg.norm(np.asarray(res)[:n]) * 1.01 + 1e-6

    def test_solver_chain_chunks_match_loop(self):
        """solvers/neumann.py uses chain chunks (check_every iterations per
        kernel) when the operator is chain-eligible; results must match the
        per-matvec driver."""
        n = 500
        rows, cols, vals = _dd_matrix(n, deg=5, seed=21)
        A = Matrix.from_coo(rows, cols, vals, (n, n), prefer="xbar")
        if not A.op().chain_ready:
            pytest.skip("pack not chain-eligible at this size")
        b = np.random.default_rng(4).standard_normal(n)
        r_chain = solve(A, b, SolverOptions(method="neumann", epsilon=1e-6,
                                            check_every=5))
        r_loop = solve(A, b, SolverOptions(method="neumann", epsilon=1e-6,
                                           check_every=1))
        assert r_chain.converged and r_loop.converged
        D = _dense_of(rows, cols, vals, (n, n))
        for r in (r_chain, r_loop):
            res = np.linalg.norm(D @ r.solution - b) / np.linalg.norm(b)
            assert res < 2e-6, res


class TestEnvOverrides:
    def test_env_k_rounds_to_k_unit(self, monkeypatch):
        """Regression (round-4 advisor): SLT_XBAR_K combined with a small-n
        geometry (k_unit=2, K_cov odd) must not produce an odd K — an odd K
        breaks the phase-2 pairing invariant (Bd % (2*Cb_pad) != 0) and the
        old fallback in _k2_group silently dropped the last dest blocks
        (max abs err 2.75 vs the dense oracle at n=640, SLT_XBAR_K=8)."""
        monkeypatch.setenv("SLT_XBAR_K", "8")
        n = 640
        rows, cols, vals = _dd_matrix(n, deg=6, seed=9)
        op = pack_xbar(rows, cols, vals, (n, n))
        assert op is not None
        assert op.K % 2 == 0, op.K
        assert op.Bd % (2 * op.Cb_pad) == 0, (op.Bd, op.Cb_pad)
        rng = np.random.default_rng(10)
        x = rng.standard_normal(n)
        x_pad = np.zeros(op.m_pad); x_pad[:n] = x
        y = np.asarray(jax.jit(op.matvec)(jnp.asarray(x_pad, jnp.float32)))[:n]
        y_ref = _dense_of(rows, cols, vals, (n, n)) @ x
        np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)

    def test_k2_group_rejects_non_divisor(self):
        from sublinear_tpu.ops.xbar import _k2_group

        with pytest.raises(ValueError, match="pairing invariant"):
            _k2_group(9, 2)  # Bd=9 not a multiple of 2*Cb_pad=4

    def test_neumann_chain_guard(self):
        """neumann_chain on a non-chain-ready operator must raise, not
        silently drop the COO tail (round-4 advisor, low)."""
        n = 700
        rows, cols, vals = _dd_matrix(n, deg=6, seed=1)
        op = pack_xbar(rows, cols, vals, (n, n))
        assert op is not None
        if op.chain_ready:
            # forge a non-ready operator: pretend the diag was not split
            import dataclasses  # noqa: F401 (plain attr tweak below)
            op.diag_split = False
        assert not op.chain_ready
        with pytest.raises(ValueError, match="chain-ready"):
            op.neumann_chain(jnp.zeros(op.m_pad, jnp.float32), 4)


class TestCgChain:
    def _spd(self, n=500, seed=3):
        rng = np.random.default_rng(seed)
        cnt = n * 5
        r = rng.integers(0, n, cnt); c = rng.integers(0, n, cnt)
        v = rng.uniform(-1, 1, cnt)
        off = r != c
        r, c, v = r[off], c[off], v[off]
        # symmetrize then diagonally dominate -> SPD
        rows = np.r_[r, c]; cols = np.r_[c, r]; vals = np.r_[v, v]
        diag = np.zeros(n)
        np.add.at(diag, rows, np.abs(vals))
        rows = np.r_[rows, np.arange(n)]
        cols = np.r_[cols, np.arange(n)]
        vals = np.r_[vals, diag * 1.2 + 1.0]
        return rows, cols, vals

    def test_cg_chain_matches_explicit_pcg(self):
        n = 500
        rows, cols, vals = self._spd(n)
        op = pack_xbar(rows, cols, vals, (n, n))
        assert op is not None
        if not op.chain_ready:
            pytest.skip("pack not chain-eligible at this size")
        rng = np.random.default_rng(4)
        b = np.zeros(op.m_pad, np.float32)
        b[:n] = rng.standard_normal(n).astype(np.float32)
        b_pad = jnp.asarray(b)
        x0 = jnp.zeros_like(b_pad)
        inv_d = op.inv_diag
        # chain: 2 chunks of 4
        r = b_pad - op.matvec(x0)
        z = inv_d * r
        rz = jnp.vdot(r, z)
        x_c, r_c, p_c, rz_c, res2 = jax.jit(
            lambda x, r, p, rz: op.cg_chain(x, r, p, rz, 4))(x0, r, z, rz)
        x_c, r_c, p_c, rz_c, res2 = jax.jit(
            lambda x, r, p, rz: op.cg_chain(x, r, p, rz, 4))(x_c, r_c, p_c, rz_c)
        # explicit PCG, 8 iterations
        x, rr, p = x0, b_pad - op.matvec(x0), None
        z = inv_d * rr; p = z; rz_e = jnp.vdot(rr, z)
        for _ in range(8):
            q = op.matvec(p)
            alpha = rz_e / jnp.vdot(p, q)
            x = x + alpha * p
            rr = rr - alpha * q
            z = inv_d * rr
            rz_new = jnp.vdot(rr, z)
            p = z + (rz_new / rz_e) * p
            rz_e = rz_new
        np.testing.assert_allclose(np.asarray(x_c)[:n], np.asarray(x)[:n],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(jnp.sqrt(res2)),
                                   float(jnp.linalg.norm(r_c)), rtol=1e-5)

    def test_solve_cg_chain_converges(self):
        n = 500
        rows, cols, vals = self._spd(n, seed=8)
        A = Matrix.from_coo(rows, cols, vals, (n, n), prefer="xbar")
        if not getattr(A.op(), "chain_ready", False):
            pytest.skip("pack not chain-eligible")
        b = np.random.default_rng(5).standard_normal(n)
        r1 = solve(A, b, SolverOptions(method="cg", epsilon=1e-6,
                                       check_every=5))
        assert r1.converged
        D = _dense_of(rows, cols, vals, (n, n))
        res = np.linalg.norm(D @ r1.solution - b) / np.linalg.norm(b)
        assert res < 5e-6, res


def test_chain_residual_norm_mode():
    """with_residual='norm' must return ||res||^2 matching the vector mode."""
    n = 500
    rows, cols, vals = _dd_matrix(n, deg=5, seed=3)
    A = Matrix.from_coo(rows, cols, vals, (n, n), prefer="xbar")
    op = A.op()
    if not op.chain_ready:
        pytest.skip("pack not chain-eligible")
    b = np.zeros(op.m_pad, np.float32)
    b[:n] = np.random.default_rng(3).standard_normal(n).astype(np.float32)
    b_pad = jnp.asarray(b)
    x1, t1, rvec = jax.jit(lambda bp: op.neumann_chain(
        op.inv_diag * bp, 8, with_residual=True))(b_pad)
    x2, t2, res2 = jax.jit(lambda bp: op.neumann_chain(
        op.inv_diag * bp, 8, with_residual="norm"))(b_pad)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=0, atol=0)
    np.testing.assert_allclose(float(res2),
                               float(jnp.sum(rvec * rvec)), rtol=1e-5)


@pytest.mark.parametrize("case", [
    ("random", 300, 4), ("random", 1100, 7), ("random", 3000, 11),
    ("banded", 900, 3), ("stencil2d", 1024, 0), ("hubcol", 700, 5),
])
def test_pack_fuzz_matches_oracle(case):
    """Property sweep: pack_xbar over structurally diverse matrices must
    either return None (caller falls back) or produce an operator whose
    matvec matches the dense oracle — never a silently wrong product.
    Covers the round-5 geometry changes (aggressive-P ladder, max-class
    capacity) across random/banded/stencil/hub patterns."""
    kind, n, deg = case
    rng = np.random.default_rng(n + deg)
    if kind == "random":
        rows, cols, vals = _dd_matrix(n, deg=deg, seed=n)
    elif kind == "banded":
        rows, cols, vals = [], [], []
        for off in (1, 2, 3):
            idx = np.arange(n - off)
            w = rng.uniform(-1, 1, n - off)
            rows += [idx, idx + off]; cols += [idx + off, idx]; vals += [w, w]
        rows = np.concatenate(rows); cols = np.concatenate(cols)
        vals = np.concatenate(vals)
        dg = np.zeros(n); np.add.at(dg, rows, np.abs(vals))
        rows = np.r_[rows, np.arange(n)]; cols = np.r_[cols, np.arange(n)]
        vals = np.r_[vals, dg * 1.4 + 1.0]
    elif kind == "stencil2d":
        side = int(np.sqrt(n)); n = side * side
        idx = np.arange(n).reshape(side, side)
        rows, cols, vals = [], [], []
        for dr, dc in ((0, 1), (1, 0)):
            a = idx[:side - dr, :side - dc].ravel()
            b_ = idx[dr:, dc:].ravel()
            rows += [a, b_]; cols += [b_, a]
            vals += [np.full(len(a), -1.0)] * 2
        rows = np.concatenate(rows + [np.arange(n)])
        cols = np.concatenate(cols + [np.arange(n)])
        vals = np.concatenate(vals + [np.full(n, 4.0)])
    else:  # hubcol: one column with n entries + random background
        rows, cols, vals = _dd_matrix(n, deg=deg, seed=n)
        hub = np.arange(n)
        rows = np.r_[rows, hub]; cols = np.r_[cols, np.zeros(n, np.int64)]
        vals = np.r_[vals, np.full(n, 0.01)]
    op = pack_xbar(np.asarray(rows), np.asarray(cols), np.asarray(vals),
                   (n, n))
    if op is None:
        return  # legitimate fallback; the Matrix layer would use ELL/DIA
    x = np.random.default_rng(1).standard_normal(n)
    x_pad = np.zeros(op.m_pad); x_pad[:n] = x
    y = np.asarray(jax.jit(op.matvec)(jnp.asarray(x_pad, jnp.float32)))[:n]
    y_ref = _dense_of(np.asarray(rows), np.asarray(cols), np.asarray(vals),
                      (n, n)) @ x
    scale = max(1.0, np.abs(y_ref).max())
    np.testing.assert_allclose(y, y_ref, rtol=3e-5, atol=3e-5 * scale)
