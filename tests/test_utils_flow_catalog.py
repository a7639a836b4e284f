"""Utils (convergence/profiling/checkpoint/complexity), flow workloads,
matrix catalog fixtures, and matrix IO."""
import json
import os

import numpy as np
import pytest

import sublinear_tpu as slt
from sublinear_tpu.generate import CATALOG_KINDS, catalog_matrix
from sublinear_tpu.graph.flow import electrical_network, max_flow, min_cost_flow
from sublinear_tpu.formats.io import load_matrix, load_vector, save_matrix
from sublinear_tpu.types import DeltaUpdate
from sublinear_tpu.utils import (
    ConvergenceChecker,
    SolverCheckpoint,
    checkpoint_of,
    fit_power_law,
    record_solve,
    resume,
    update_rhs,
    validate_complexity,
)


# ------------------------------------------------------------------ utils

def test_convergence_checker_rate_and_eta():
    cc = ConvergenceChecker(window=5)
    for r in [1.0, 0.5, 0.25, 0.125]:
        info = cc.check(r, 1e-6)
    assert not info.converged
    assert abs(info.rate - 0.5) < 1e-6
    assert info.estimated_iterations_remaining is not None
    assert not info.stagnated
    info = cc.check(1e-7, 1e-6)
    assert info.converged


def test_convergence_checker_stagnation():
    cc = ConvergenceChecker(window=4)
    for _ in range(6):
        info = cc.check(0.5, 1e-6)
    assert info.stagnated


def test_profiling_record():
    A, b = slt.generate("tridiagonal", 64), slt.rhs(64)
    r = slt.solve(A, b, method="conjugate-gradient")
    rec = record_solve(A, r, matvec_count=r.iterations + 1)
    assert rec.n == 64 and rec.nnz == A.nnz
    assert rec.nnz_per_second > 0
    doc = json.loads(rec.to_json())
    assert doc["method"] == "conjugate-gradient"


def test_checkpoint_roundtrip_and_resume(tmp_path):
    A = slt.Matrix(slt.generate("tridiagonal", 100).csr.add_diagonal(0.5))
    b = slt.rhs(100, seed=1)
    partial = slt.solve(A, b, method="jacobi", max_iterations=5, raise_on_fail=False)
    ckpt = checkpoint_of(partial, b)
    path = str(tmp_path / "ckpt.npz")
    ckpt.save(path)
    loaded = SolverCheckpoint.load(path)
    result = resume(A, loaded, slt.SolverOptions(epsilon=1e-8), method="conjugate-gradient")
    assert result.converged
    x_ref = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(result.solution, x_ref, rtol=1e-3, atol=1e-4)


def test_update_rhs_incremental():
    A = slt.Matrix(slt.generate("tridiagonal", 80).csr.add_diagonal(0.5))
    b = slt.rhs(80, seed=2)
    r1 = slt.solve(A, b, method="conjugate-gradient", epsilon=1e-8)
    delta = DeltaUpdate(indices=np.array([3, 10]), values=np.array([0.05, -0.02]))
    r2, b_new = update_rhs(A, r1, delta, b, slt.SolverOptions(epsilon=1e-8))
    assert r2.converged
    x_ref = np.linalg.solve(A.to_dense(), b_new)
    np.testing.assert_allclose(r2.solution, x_ref, rtol=1e-3, atol=1e-4)
    # warm start should need very few extra iterations
    assert r2.iterations - r1.iterations <= r1.iterations


def test_complexity_fit():
    ns = np.array([100, 200, 400, 800])
    times = 3e-6 * ns**2
    fit = fit_power_law(ns, times)
    assert abs(fit.exponent - 2.0) < 0.05
    assert fit.r_squared > 0.999
    out = validate_complexity(ns, times, claimed_exponent=2.0)
    assert out["withinTolerance"]


# ------------------------------------------------------------------ flow

def test_electrical_network_voltage_divider():
    # 0 --R=1-- 1 --R=1-- 2 ; V0=1, V2=0 -> V1=0.5, current 0.5
    out = electrical_network(3, [(0, 1), (1, 2)], [1.0, 1.0], {0: 1.0, 2: 0.0})
    v = out["voltages"]
    assert abs(v[0] - 1.0) < 1e-3 and abs(v[2]) < 1e-3
    assert abs(v[1] - 0.5) < 1e-3
    assert abs(out["edgeCurrents"][0]["current"] - 0.5) < 1e-3


def test_max_flow_simple():
    # diamond: 0->1 (3), 0->2 (2), 1->3 (2), 2->3 (3) => maxflow 4
    out = max_flow(4, [(0, 1), (0, 2), (1, 3), (2, 3)], [3, 2, 2, 3], 0, 3)
    assert abs(out["maxFlow"] - 4.0) < 1e-9


def test_min_cost_flow_balances():
    out = min_cost_flow(3, [(0, 1), (1, 2), (0, 2)], [1.0, 1.0, 2.0], {0: 1.0, 2: -1.0})
    assert out["convergenceInfo"]["converged"]
    # net flow out of node 0 equals supply
    net0 = sum(f["flow"] for f in out["flows"] if f["edge"][0] == 0) - sum(
        f["flow"] for f in out["flows"] if f["edge"][1] == 0
    )
    assert abs(net0 - 1.0) < 1e-3


# ------------------------------------------------------------------ catalog

@pytest.mark.parametrize("kind", CATALOG_KINDS)
def test_catalog_kinds_solvable(kind):
    n = 64
    A = catalog_matrix(kind, n, seed=1)
    assert A.shape == (n, n)
    b = slt.rhs(n, seed=1)
    a = slt.analyze(A)
    eps = 1e-6 if kind != "spd_ill" else 1e-3
    method = "conjugate-gradient"
    r = slt.solve(A, b, method=method, epsilon=eps, max_iterations=20000, raise_on_fail=False)
    x_ref = np.linalg.solve(A.to_dense(), b)
    if kind == "spd_ill":
        # kappa ~ 1e6 in f32: check residual-level agreement only
        assert r.residual / np.linalg.norm(b) < 1e-2
    else:
        assert r.converged, f"{kind}: residual {r.residual}"
        np.testing.assert_allclose(r.solution, x_ref, rtol=5e-3, atol=1e-3)


def test_catalog_dd_flags():
    a_sym = slt.analyze(catalog_matrix("dd_symmetric", 50))
    assert a_sym.is_diagonally_dominant and a_sym.is_symmetric
    a_asym = slt.analyze(catalog_matrix("dd_asymmetric", 50))
    assert a_asym.is_diagonally_dominant and not a_asym.is_symmetric
    a_band = slt.analyze(catalog_matrix("banded", 50))
    assert a_band.bandwidth <= 3


# ------------------------------------------------------------------ io

def test_matrix_market_roundtrip(tmp_path):
    A = slt.generate("random-sparse", 20, seed=3, density=0.2)
    p = str(tmp_path / "a.mtx")
    save_matrix(A, p)
    B = load_matrix(p)
    np.testing.assert_allclose(B.to_dense(), A.to_dense(), rtol=1e-12)


def test_csv_roundtrip(tmp_path):
    A = slt.generate("tridiagonal", 8)
    p = str(tmp_path / "a.csv")
    save_matrix(A, p)
    B = load_matrix(p)
    np.testing.assert_allclose(B.to_dense(), A.to_dense(), atol=1e-12)


def test_symmetric_mtx_expansion(tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real symmetric\n3 3 3\n1 1 2.0\n2 1 -1.0\n3 3 5.0\n")
    M = load_matrix(str(p))
    dense = M.to_dense()
    assert dense[0, 1] == dense[1, 0] == -1.0
    assert dense[2, 2] == 5.0


def test_gml_reader(tmp_path):
    from sublinear_tpu.formats.io import read_gml

    gml = """
graph [
  directed 0
  node [ id 0 label "a" ]
  node [ id 1 label "b" ]
  node [ id 2 label "c" ]
  edge [ source 0 target 1 value 2.5 ]
  edge [ source 1 target 2 ]
]
"""
    p = tmp_path / "g.gml"
    p.write_text(gml)
    A = read_gml(str(p))
    assert A.shape == (3, 3)
    dense = A.to_dense()
    assert dense[0, 1] == dense[1, 0] == 2.5
    assert dense[1, 2] == dense[2, 1] == 1.0


def test_compensated_reductions():
    import jax.numpy as jnp

    from sublinear_tpu.ops.reductions import compensated_dot, compensated_norm, kahan_sum

    rng = np.random.default_rng(0)
    # pathological cancellation case: big + many smalls
    x = np.concatenate([[1e8], rng.uniform(0, 1, 5000), [-1e8]]).astype(np.float32)
    naive = float(jnp.sum(jnp.asarray(x)))
    comp = float(kahan_sum(jnp.asarray(x)))
    exact = float(np.sum(x.astype(np.float64)))
    # guarantee: no worse than the naive sum on adversarial cancellation,
    # and f64-close on uniform data (intra-block rounding is not compensated)
    assert abs(comp - exact) <= abs(naive - exact) + 1e-3
    u = rng.uniform(0, 1, 100_000).astype(np.float32)
    cu = float(kahan_sum(jnp.asarray(u)))
    eu = float(np.sum(u.astype(np.float64)))
    assert abs(cu - eu) / eu < 1e-6
    a = rng.uniform(-1, 1, 3000).astype(np.float32)
    b = rng.uniform(-1, 1, 3000).astype(np.float32)
    cd = float(compensated_dot(jnp.asarray(a), jnp.asarray(b)))
    assert abs(cd - float(a.astype(np.float64) @ b.astype(np.float64))) < 1e-3
    cn = float(compensated_norm(jnp.asarray(a)))
    assert abs(cn - np.linalg.norm(a.astype(np.float64))) < 1e-3


def test_csv_series_loader(tmp_path):
    from sublinear_tpu.models.trainer import load_series_csv, make_windows

    p = tmp_path / "series.csv"
    p.write_text("time,price\n0,100.5\n1,101.0\n2,100.8\n3,101.2\n")
    s = load_series_csv(str(p), column="price")
    np.testing.assert_allclose(s, [100.5, 101.0, 100.8, 101.2])
    s2 = load_series_csv(str(p), column=-1)
    np.testing.assert_allclose(s2, s)


def test_error_taxonomy_codes():
    """Every reference error code is addressable (error.rs / types.ts parity)."""
    from sublinear_tpu.errors import ERROR_CODES, SolverError

    assert ERROR_CODES["NOT_DIAGONALLY_DOMINANT"] == "E001"
    assert ERROR_CODES["CONVERGENCE_FAILED"] == "E002"
    assert ERROR_CODES["TIMEOUT"] == "E004"
    e = slt.InvalidParametersError("bad", {"k": 1})
    d = e.to_dict()
    assert d["code"] == "E008" and d["details"]["k"] == 1


def test_solver_options_presets():
    hp = slt.SolverOptions.high_precision()
    assert hp.epsilon == 1e-10 and hp.max_iterations == 10000
    fast = slt.SolverOptions.fast()
    assert fast.epsilon == 1e-4
    stream = slt.SolverOptions.streaming()
    assert stream.check_every == 1


def test_lru_caches_bounded():
    """Serving lifecycle: derived-table caches must not grow without bound
    when many distinct matrices pass through (round-1 finding: module-level
    caches keyed by Matrix.uid leaked device memory per matrix)."""
    import sublinear_tpu as slt
    from sublinear_tpu.solvers import random_walk as rw
    from sublinear_tpu.solvers import bmssp as bm

    for seed in range(40):
        A = slt.generate("random-sparse", 24, seed=seed, density=0.2)
        rw.sampling_tables(A)
        bm.in_edge_tables(A)
    assert len(rw._TABLE_CACHE) <= 32
    assert len(bm._TABLE_CACHE) <= 32
    # hit path still works
    A = slt.generate("random-sparse", 24, seed=99, density=0.2)
    t1 = rw.sampling_tables(A)
    t2 = rw.sampling_tables(A)
    assert t1 is t2
