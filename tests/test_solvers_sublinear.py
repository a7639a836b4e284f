"""Push / random-walk / hybrid / BMSSP solver tests.

Property-style checks mirroring the reference's push test suites
(/root/reference/tests/rust/push_tests.rs — convergence, locality,
reachability) and hybrid_tests.rs, with NumPy f64 oracles.
"""
import numpy as np
import pytest

import sublinear_tpu as slt
from conftest import make_dd_system


def test_forward_push_converges():
    A, b, x_ref = make_dd_system(n=64, density=0.1, seed=0)
    r = slt.solve(A, b, method="forward-push", epsilon=1e-6)
    assert r.converged
    np.testing.assert_allclose(r.solution, x_ref, rtol=5e-4, atol=1e-4)


def test_forward_push_sparse_rhs_locality():
    """Push with a single-entry RHS on a banded system stays localized:
    the solution mass concentrates near the source (push's O(1/eps) story)."""
    n = 256
    A = slt.Matrix(slt.generate("tridiagonal", n).csr.add_diagonal(0.5))  # strictly DD
    b = np.zeros(n)
    b[128] = 1.0
    r = slt.solve(A, b, method="forward-push", epsilon=1e-8)
    assert r.converged
    x_ref = np.linalg.solve(A.to_dense(), b)
    np.testing.assert_allclose(r.solution, x_ref, rtol=1e-3, atol=1e-5)


def test_backward_push_full_solve_delegates():
    A, b, x_ref = make_dd_system(n=64, density=0.1, seed=1)
    r = slt.solve(A, b, method="backward-push", epsilon=1e-6)
    assert r.converged
    np.testing.assert_allclose(r.solution, x_ref, rtol=5e-4, atol=1e-4)


def test_bidirectional_push_polish():
    A, b, x_ref = make_dd_system(n=64, density=0.1, seed=2)
    r = slt.solve(A, b, method="bidirectional", epsilon=1e-6)
    assert r.converged
    assert r.method == "bidirectional"
    np.testing.assert_allclose(r.solution, x_ref, rtol=5e-4, atol=1e-4)


def test_adjoint_push_solve():
    from sublinear_tpu.solvers.push import adjoint_solve

    A, b, _ = make_dd_system(n=50, density=0.1, seed=3)
    e = np.zeros(50)
    e[7] = 1.0
    y, k, res = adjoint_solve(A, e, slt.SolverOptions(epsilon=1e-8))
    y = np.asarray(y)[:50]
    y_ref = np.linalg.solve(A.to_dense().T, e)
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-5)
    # x_7 = y . b (the backward-push single-entry identity)
    x_ref = np.linalg.solve(A.to_dense(), b)
    assert abs(float(y @ b) - x_ref[7]) < 1e-3 * max(1, abs(x_ref[7]))


def test_random_walk_estimates_solution():
    # strong dominance => small spectral radius => low-variance walks
    A = slt.generate("random-sparse", 48, seed=5, density=0.08)
    # strengthen diagonal further for fast geometric decay
    A = slt.Matrix(A.csr.add_diagonal(2.0))
    b = slt.rhs(48, seed=5)
    x_ref = np.linalg.solve(A.to_dense(), b)
    r = slt.solve(A, b, method="random-walk", epsilon=0.05,
                  num_walks=2000, seed=1, raise_on_fail=False)
    err = np.abs(r.solution - x_ref)
    scale = np.abs(x_ref).max()
    assert err.max() < 0.08 * max(scale, 1.0), f"max err {err.max():.4f}"


def test_random_walk_entry_estimates():
    from sublinear_tpu.solvers.random_walk import walk_estimate

    A = slt.generate("random-sparse", 48, seed=6, density=0.08)
    A = slt.Matrix(A.csr.add_diagonal(2.0))
    b = slt.rhs(48, seed=6)
    x_ref = np.linalg.solve(A.to_dense(), b)
    est, var, steps = walk_estimate(A, b, [0, 7, 33], slt.SolverOptions(num_walks=4000, seed=2))
    np.testing.assert_allclose(est, x_ref[[0, 7, 33]], atol=0.05)
    assert np.all(var >= 0)


def test_hybrid_converges_and_reports_phases():
    A, b, x_ref = make_dd_system(n=96, density=0.06, seed=7)
    r = slt.solve(A, b, method="hybrid", epsilon=1e-6)
    assert r.converged
    assert r.method == "hybrid"
    assert r.phases is not None and len(r.phases) >= 1
    np.testing.assert_allclose(r.solution, x_ref, rtol=5e-4, atol=1e-4)


def test_bmssp_small_falls_back_to_cg():
    A, b, x_ref = make_dd_system(n=64, density=0.1, seed=8)
    r = slt.solve(A, b, method="bmssp", epsilon=1e-6)
    assert r.method.startswith("bmssp")
    assert r.converged
    np.testing.assert_allclose(r.solution, x_ref, rtol=5e-4, atol=1e-4)


def test_bmssp_graph_path():
    """Sparse large-ish system with sparse RHS exercises the Bellman-Ford path."""
    n = 512
    A = slt.generate("random-sparse", n, seed=9, density=0.004)
    b = np.zeros(n)
    b[3] = 1.0
    r = slt.solve(A, b, method="bmssp", epsilon=1e-6, raise_on_fail=False)
    assert r.solution.shape == (n,)
    # source coordinate gets the dominant mass: x_src = b_src / (1 + 0)
    assert abs(r.solution[3] - 1.0) < 1e-6 or r.method != "bmssp"


def test_bmssp_shortest_paths_vs_dijkstra_oracle():
    from sublinear_tpu.solvers.bmssp import shortest_paths

    n = 128
    A = slt.generate("random-sparse", n, seed=10, density=0.03)
    dist, x, sweeps = shortest_paths(A, [0])
    # oracle: dense Dijkstra in numpy (O(n^2))
    dense = np.abs(A.to_dense())
    np.fill_diagonal(dense, 0.0)
    with np.errstate(divide="ignore"):
        cost = np.where(dense > 0, 1.0 / dense, np.inf)
    dist_ref = np.full(n, np.inf)
    dist_ref[0] = 0.0
    done = np.zeros(n, dtype=bool)
    for _ in range(n):
        u = np.argmin(np.where(done, np.inf, dist_ref))
        if not np.isfinite(dist_ref[u]):
            break
        done[u] = True
        nd = dist_ref[u] + cost[u]
        dist_ref = np.minimum(dist_ref, nd)
    reach = np.isfinite(dist_ref)
    np.testing.assert_allclose(dist[:n][reach], dist_ref[reach], rtol=1e-4)
    assert np.all(dist[:n][~reach] > 1e29)


def _strong_dd(n=48, seed=6):
    A = slt.generate("random-sparse", n, seed=seed, density=0.08)
    A = slt.Matrix(A.csr.add_diagonal(2.0))
    b = slt.rhs(n, seed=seed)
    return A, b, np.linalg.solve(A.to_dense(), b)


def test_sampling_strategies_all_unbiased():
    """Every sampling strategy estimates the same entries (reference
    sampling.rs AdaptiveSampler strategy sweep)."""
    from sublinear_tpu.solvers.random_walk import walk_estimate

    A, b, x_ref = _strong_dd()
    nodes = [0, 7, 33]
    for strat in ["importance", "uniform", "stratified", "qmc", "adaptive"]:
        est, var, steps = walk_estimate(
            A, b, nodes, slt.SolverOptions(num_walks=4000, seed=3, sampling=strat))
        np.testing.assert_allclose(est, x_ref[nodes], atol=0.08,
                                   err_msg=f"strategy={strat}")
        assert np.all(var >= 0)


def test_stratified_and_qmc_reduce_variance():
    """Stratified/QMC u-sequences should not increase variance vs iid
    uniform driving of the same importance proposal (averaged over nodes)."""
    from sublinear_tpu.solvers.random_walk import walk_estimate

    A, b, x_ref = _strong_dd(seed=9)
    nodes = list(range(16))
    base = slt.SolverOptions(num_walks=2000, seed=11, variance_reduction="none")
    _, var_iid, _ = walk_estimate(A, b, nodes, base)
    for strat in ["stratified", "qmc"]:
        opts = slt.SolverOptions(num_walks=2000, seed=11, sampling=strat,
                                 variance_reduction="none")
        est, var, _ = walk_estimate(A, b, nodes, opts)
        np.testing.assert_allclose(est, x_ref[nodes], atol=0.08)
        assert var.mean() <= var_iid.mean() * 1.25, (strat, var.mean(), var_iid.mean())


def test_multilevel_estimate_matches_oracle():
    from sublinear_tpu.solvers.sampling import SamplingStats, multilevel_estimate

    A, b, x_ref = _strong_dd(seed=4)
    nodes = np.array([1, 5, 40])
    stats = SamplingStats()
    est, var, steps = multilevel_estimate(
        A, b, nodes, slt.SolverOptions(num_walks=4000, seed=5), stats=stats)
    np.testing.assert_allclose(est, x_ref[nodes], atol=0.08)
    assert stats.total_walks > 0 and len(stats.phases) == 3
    # deep levels must use geometrically fewer walks
    assert stats.phases[2]["walks"] < stats.phases[0]["walks"]


def test_adaptive_allocates_by_variance():
    from sublinear_tpu.solvers.sampling import SamplingStats, adaptive_walk_estimate

    A, b, x_ref = _strong_dd(seed=8)
    nodes = np.arange(8)
    stats = SamplingStats()
    est, var, _ = adaptive_walk_estimate(
        A, b, nodes, slt.SolverOptions(num_walks=2000, seed=7), stats=stats)
    np.testing.assert_allclose(est, x_ref[nodes], atol=0.08)
    assert [p["phase"] for p in stats.phases] == ["pilot", "refine"]


def test_hybrid_rate_switching_and_decaying_blend():
    """Phase transitions must be improvement-rate driven and the MC blend
    must decay (reference hybrid.rs:251-279, :350-376).  A weakly-DD system
    stalls the push phase early, triggering the rate switch."""
    import dataclasses as _dc

    n = 200
    # weak dominance: push sweeps stall quickly
    A_tri = slt.generate("tridiagonal", n, off_diagonal=-0.49)
    b = slt.rhs(n, seed=2)
    r = slt.solve(A_tri, b, slt.SolverOptions(method="hybrid", epsilon=1e-6))
    assert r.converged
    assert r.phases is not None
    push = r.phases[0]
    assert push["switch_reason"] in ("improvement-rate", "converged", "budget")
    mc = [p for p in r.phases if p["phase"] == "random-walk"]
    if mc:
        blends = mc[0]["blends"]
        assert all(b2 < b1 for b1, b2 in zip(blends, blends[1:]))
    # a genuinely stalling system must show the rate trigger
    found_rate = push["switch_reason"] == "improvement-rate" or (
        mc and mc[0]["switch_reason"] == "improvement-rate"
    )
    assert found_rate or push["switch_reason"] == "converged"


def test_hybrid_runs_above_4096():
    """Round-1 gate (MC phase hard-capped at n<=4096) is gone: hybrid must
    run its phases at larger n without error."""
    n = 5000
    A = slt.generate("random-sparse", n, seed=3, density=5e-4)
    b = slt.rhs(n, seed=3)
    r = slt.solve(A, b, slt.SolverOptions(method="hybrid", epsilon=1e-5))
    assert r.converged


# ---------------------------------------------------------------- round 3:
# control variates + E007 walker-memory guards (VERDICT r2 items 7 & 8)

def test_control_variates_reduces_variance():
    """control-variates = exact Neumann head + MC tail: same expectation,
    tail-only variance (reference VarianceReduction::ControlVariates,
    random_walk.rs:31-39)."""
    from sublinear_tpu.solvers.random_walk import walk_estimate

    A, b, x_ref = _strong_dd(seed=13)
    nodes = list(range(16))
    plain = slt.SolverOptions(num_walks=800, seed=21, variance_reduction="none")
    _, var_plain, _ = walk_estimate(A, b, nodes, plain)
    cv = slt.SolverOptions(num_walks=800, seed=21, variance_reduction="control-variates")
    est, var_cv, _ = walk_estimate(A, b, nodes, cv)
    np.testing.assert_allclose(est, x_ref[nodes], atol=0.05)
    # the deterministic head removes most of the sampling noise
    assert var_cv.mean() < var_plain.mean() * 0.5, (var_cv.mean(), var_plain.mean())


def test_walker_chunking_matches_oracle(monkeypatch):
    """A tiny SLT_MEMORY_LIMIT_BYTES forces run_walks to split the walker
    batch into many chunks; estimates stay unbiased across chunk seams."""
    from sublinear_tpu.solvers.random_walk import max_walkers_for_memory, walk_estimate

    monkeypatch.setenv("SLT_MEMORY_LIMIT_BYTES", str(2_000_000))
    A, b, x_ref = _strong_dd(seed=14)
    K = int(A.csr.row_nnz().max())
    cap = max_walkers_for_memory(K)
    nodes = list(range(24))
    W = 2000
    assert len(nodes) * W > cap, "test must actually exercise the chunked path"
    est, var, _ = walk_estimate(
        A, b, nodes, slt.SolverOptions(num_walks=W, seed=5))
    np.testing.assert_allclose(est, x_ref[nodes], atol=0.08)
    assert np.all(np.isfinite(var))


def test_sampling_tables_raise_e007_over_budget(monkeypatch):
    """Table builds route through the same device-bytes budget as operator
    builds instead of silently OOMing."""
    from sublinear_tpu.errors import MemoryLimitError
    from sublinear_tpu.solvers.random_walk import sampling_tables

    A, _, _ = _strong_dd(n=200, seed=15)
    monkeypatch.setenv("SLT_MEMORY_LIMIT_BYTES", "1000")
    with pytest.raises(MemoryLimitError) as ei:
        sampling_tables(A)
    assert ei.value.code == "E007"


def test_hybrid_100k_under_memory_limit(monkeypatch):
    """n=100k hybrid (phase 2 spawns n x 64 = 6.4M walkers) completes under a
    48 MB device budget: the walker batch is chunked through E007 sizing
    instead of materializing (W, K) gathers for all walkers at once."""
    monkeypatch.setenv("SLT_MEMORY_LIMIT_BYTES", str(48 * 1024 * 1024))
    n = 100_000
    A = slt.Matrix(slt.generate("tridiagonal", n).csr.add_diagonal(0.5))
    b = slt.rhs(n, seed=3)
    # small iteration budget: push exits on budget with a big residual so the
    # walker phase genuinely runs at full n
    from sublinear_tpu.solvers.hybrid import solve_hybrid

    opts = slt.SolverOptions(epsilon=1e-6, max_iterations=20, max_walk_length=64)
    r = solve_hybrid(A, b, opts, raise_on_fail=False)
    assert np.all(np.isfinite(r.solution))
    phases = {p["phase"] for p in r.phases}
    assert "random-walk" in phases, r.phases
    assert r.residual < float(np.linalg.norm(b))
