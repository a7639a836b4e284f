"""Tiled one-hot SpMM kernel: packing invariants + product vs oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

import sublinear_tpu as slt
from sublinear_tpu.ops.pallas_spmv import OneHotTiles, build_tiles, onehot_spmm


def make(n=600, density=0.01, seed=0, R=256, C=256, T=128):
    A = slt.generate("random-sparse", n, seed=seed, density=density)
    tiles = build_tiles(A.csr, R=R, C=C, T=T)
    return A, tiles


def test_build_tiles_invariants():
    A, tiles = make()
    assert tiles.n_pad % tiles.R == 0 and tiles.m_pad % tiles.C == 0
    rb = np.asarray(tiles.tile_rb)
    assert np.all(np.diff(rb) >= 0), "tiles must be row-block sorted"
    first = np.asarray(tiles.tile_first)
    assert first[0] == 1
    changes = np.nonzero(np.diff(rb) > 0)[0] + 1
    assert np.all(first[changes] == 1)
    # all entries preserved
    assert np.count_nonzero(np.asarray(tiles.vals)) == np.count_nonzero(A.csr.data)


def test_onehot_spmm_matches_oracle():
    A, tiles = make(n=600, density=0.01, seed=1)
    rng = np.random.default_rng(0)
    B = 8
    X = rng.normal(size=(600, B))
    X_pad = np.zeros((tiles.m_pad, B), dtype=np.float32)
    X_pad[:600] = X
    Y = np.asarray(onehot_spmm(tiles, jnp.asarray(X_pad)))[:600]
    oracle = A.to_dense() @ X
    # bf16 one-hot passes: ~3e-3 relative accuracy
    np.testing.assert_allclose(Y, oracle, rtol=2e-2, atol=2e-2 * np.abs(oracle).max())


def test_onehot_spmm_hub_rows():
    # one dense row exercises multi-tile blocks
    n = 300
    rows = [5] * 250 + list(range(n))
    cols = list(range(250)) + list(range(n))
    vals = [0.01] * 250 + [3.0] * n
    A = slt.Matrix.from_coo(rows, cols, vals, (n, n))
    tiles = build_tiles(A.csr, R=128, C=128, T=64)
    X = np.ones((tiles.m_pad, 8), dtype=np.float32)
    Y = np.asarray(onehot_spmm(tiles, jnp.asarray(X)))[:n]
    oracle = A.to_dense() @ np.ones((n, 8))
    np.testing.assert_allclose(Y, oracle, rtol=2e-2, atol=1e-2 * np.abs(oracle).max())


def test_fill_factor_reported():
    A, tiles = make(n=600, density=0.05, seed=2)
    assert 0 < tiles.fill <= 1.0
