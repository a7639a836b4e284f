"""Social dynamics, swarm coordinator, unified benchmark runner."""
import numpy as np
import pytest

import sublinear_tpu as slt
from sublinear_tpu.benchmarks import bench_linear_system, run_all, scaling_study
from sublinear_tpu.graph.social import (
    degroot_consensus,
    friedkin_johnsen,
    influence_propagation,
    row_normalize,
)
from sublinear_tpu.interfaces.swarm import SwarmCoordinator, SwarmWorker


def two_community_graph(n=20):
    dense = np.zeros((n, n))
    half = n // 2
    dense[:half, :half] = 1.0
    dense[half:, half:] = 1.0
    np.fill_diagonal(dense, 0.0)
    dense[half - 1, half] = dense[half, half - 1] = 1.0
    return slt.Matrix.from_dense(dense)


def test_friedkin_johnsen_pulls_toward_neighbors():
    A = two_community_graph()
    x0 = np.concatenate([np.ones(10), -np.ones(10)])
    out = friedkin_johnsen(A, x0, susceptibility=0.3)
    assert out["convergenceInfo"]["converged"]
    x = np.asarray(out["opinions"])
    # opinions stay polarized by community but shrink toward 0 at the bridge
    assert x[:10].mean() > 0 > x[10:].mean()
    assert abs(x).max() <= 1.0 + 1e-6
    assert out["polarization"] < float(np.var(x0))


def test_degroot_consensus_on_connected_graph():
    n = 16
    rng = np.random.default_rng(0)
    dense = (rng.random((n, n)) < 0.4).astype(float)
    np.fill_diagonal(dense, 1.0)  # self-loops -> primitive chain
    A = slt.Matrix.from_dense(dense)
    x0 = rng.normal(size=n)
    out = degroot_consensus(A, x0, steps=300)
    assert out["spread"] < 1e-3  # consensus reached


def test_influence_propagation_seed_reach():
    A = two_community_graph()
    out = influence_propagation(A, seeds=[0], top_k=5)
    assert out["converged"]
    top = {d["node"] for d in out["topInfluenced"]}
    # influence stays concentrated in the seed's community
    assert len(top & set(range(10))) >= 4


def test_row_normalize_stochastic():
    A = two_community_graph()
    W = row_normalize(A)
    sums = W.to_dense().sum(axis=1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-12)


def test_swarm_register_route_and_costs():
    coord = SwarmCoordinator()
    w1 = SwarmWorker(coord)  # in-process worker
    w2 = SwarmWorker(coord)
    coord.update_cost(w2.info.id, 100.0)  # expensive worker
    A = slt.generate("random-sparse", 24, seed=1, density=0.15)
    b = slt.rhs(24, seed=1)
    result = coord.submit({"matrix": A.to_dict(), "vector": b.tolist()})
    assert result["converged"] is True
    assert result["workerId"] == w1.info.id  # cheapest picked
    agg = coord.aggregate_costs()
    assert agg["workers"] == 2 and agg["updates"] >= 2


def test_swarm_reaps_dead_workers():
    coord = SwarmCoordinator(heartbeat_timeout=0.0)
    w = coord.register()
    import time

    time.sleep(0.01)
    coord.reap()
    assert coord.pick_worker() is None


def test_benchmark_runner_smoke():
    r = bench_linear_system(n=128, density=0.05, method="conjugate-gradient", reps=1)
    assert r.converged and r.wall_ms > 0
    assert r.domain == "linear_systems"


def test_scaling_study_smoke():
    out = scaling_study(sizes=(64, 128), method="conjugate-gradient")
    assert len(out["results"]) == 2
    assert "exponent" in out["fit"]
