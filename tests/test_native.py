"""Native C++ helper tests: parity with NumPy reference implementations."""
import numpy as np
import pytest

import sublinear_tpu as slt
from sublinear_tpu import native
from sublinear_tpu.formats.csr import CSR

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")


def test_native_coo_to_csr_matches_numpy():
    rng = np.random.default_rng(0)
    n, nnz = 50, 500
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz)
    ref = CSR.from_coo(rows, cols, vals, (n, n))
    indptr, indices, data = native.coo_to_csr(rows, cols, vals, n)
    got = CSR(indptr, indices, data, (n, n))
    np.testing.assert_allclose(got.to_dense(), ref.to_dense(), rtol=1e-12)


def test_native_coloring_is_proper():
    A = slt.generate("random-sparse", 300, seed=1, density=0.02)
    t = A.T_csr()
    colors = native.greedy_coloring(A.csr.indptr, A.csr.indices, t.indptr, t.indices, 300)
    # proper coloring: no structurally-coupled pair shares a color
    r, c, _ = A.csr.to_coo()
    off = r != c
    assert np.all(colors[r[off]] != colors[c[off]])


def test_native_coloring_used_for_large_gs():
    """Large multicolor GS path goes through the native colorer and stays correct."""
    n = 2500
    A = slt.Matrix(slt.generate("tridiagonal", n).csr.add_diagonal(0.5))
    b = slt.rhs(n, seed=2)
    r = slt.solve(A, b, method="gauss-seidel", epsilon=1e-6)
    assert r.converged


def test_native_dijkstra_matches_device_bellman_ford():
    from sublinear_tpu.solvers.bmssp import shortest_paths

    n = 200
    A = slt.generate("random-sparse", n, seed=3, density=0.02)
    dist_dev, _, _ = shortest_paths(A, [0, 5], [1.0, 2.0])
    dist_nat, srcval = native.dijkstra_multi_source(
        A.csr.indptr, A.csr.indices, A.csr.data, n, np.array([0, 5]), np.array([1.0, 2.0])
    )
    reach = dist_nat < 1e29
    np.testing.assert_allclose(dist_dev[:n][reach], dist_nat[reach], rtol=1e-4)


def test_rcm_reduces_bandwidth_and_solves():
    """RCM on a randomly-permuted tridiagonal system recovers a small
    bandwidth, re-enabling the zero-gather DIA operator."""
    import numpy as np
    import sublinear_tpu as slt
    from sublinear_tpu.formats.dia import DiaOperator

    n = 200
    rng = np.random.default_rng(3)
    scramble = rng.permutation(n)
    T = slt.generate("tridiagonal", n).csr.add_diagonal(0.5)
    rows, cols, vals = T.to_coo()
    A = slt.Matrix.from_coo(scramble[rows], scramble[cols], vals, (n, n))
    assert A.csr.bandwidth() > 50  # scrambled: huge bandwidth

    B, perm = A.reorder_rcm()
    assert B.csr.bandwidth() <= 2  # RCM recovers the chain ordering
    assert isinstance(B.op(), DiaOperator)

    # permuted-solve equivalence: solve B y = b[perm]; x[perm] = y
    b = slt.rhs(n, seed=4)
    r = slt.solve(B, np.asarray(b)[perm], method="conjugate-gradient", epsilon=1e-7)
    x = np.empty(n)
    x[perm] = r.solution
    rel = np.linalg.norm(A.csr.matvec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-5


def test_rcm_python_fallback_matches_native():
    import numpy as np
    import sublinear_tpu as slt
    from sublinear_tpu import native

    A = slt.generate("random-sparse", 60, seed=7, density=0.1)
    csr, t = A.csr, A.csr.transpose()
    if native.available():
        p_native = native.rcm_ordering(csr.indptr, csr.indices, t.indptr, t.indices, 60)
        lib = native._lib
        native._lib = None  # force fallback
        try:
            p_py = native.rcm_ordering(csr.indptr, csr.indices, t.indptr, t.indices, 60)
        finally:
            native._lib = lib
        np.testing.assert_array_equal(p_native, p_py)
    else:
        p = native.rcm_ordering(csr.indptr, csr.indices, t.indptr, t.indices, 60)
        assert sorted(p) == list(range(60))
