"""Tiled one-hot SpMM Pallas kernel — the MXU path for batched large-n SpMV.

Motivation (ARCHITECTURE.md): XLA's TPU gather costs ~16 cycles per element,
making single-RHS large-n SpMV slower than a SIMD CPU.  This kernel re-routes
both the gather AND the scatter through the MXU: entries are tiled by
(row-block, col-block); inside a tile the column gather becomes

    G = onehot(lcol) @ X_block        (T, C) @ (C, B)   bf16 -> f32

and the row scatter becomes

    OUT_block += onehot(lrow)^T @ (vals * G)    (R, T) @ (T, B)

with the one-hot masks generated on the fly on the VPU (~C/1024 cycles per
entry) and amortized over all B RHS columns.  Tiles are routed by
scalar-prefetched (row-block, col-block) ids; consecutive tiles share the
same output block, which is zeroed on first visit and accumulated in VMEM.

Host-side packing: build_tiles() — entries sorted by (rb, cb), padded to
T-entry tiles (pad entries carry val=0 at local index 0).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import round_up
from ..formats.csr import CSR

# Mosaic block constraint: tile entry arrays are stored (n_tiles, 8, T//8)
# with T//8 a multiple of 128, so T must be a multiple of 1024.
TILE_R = 1024
TILE_C = 1024
TILE_T = 1024


@dataclasses.dataclass
class OneHotTiles:
    vals: jax.Array      # (n_tiles, 8, T//8) f32
    lrow: jax.Array      # (n_tiles, 8, T//8) i32 in [0, R)
    lcol: jax.Array      # (n_tiles, 8, T//8) i32 in [0, C)
    tile_rb: jax.Array   # (n_tiles,) i32
    tile_cb: jax.Array   # (n_tiles,) i32
    tile_first: jax.Array  # (n_tiles,) i32: 1 when first tile of its rb
    n_pad: int           # rows padded to multiple of R
    m_pad: int           # cols padded to multiple of C
    shape: tuple
    R: int = TILE_R
    C: int = TILE_C
    T: int = TILE_T

    @property
    def n_tiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def fill(self) -> float:
        return float(np.count_nonzero(np.asarray(self.vals))) / max(self.vals.size, 1)


def build_tiles(csr: CSR, R: int = TILE_R, C: int = TILE_C, T: int = TILE_T) -> OneHotTiles:
    n, m = csr.shape
    n_pad = round_up(max(n, 1), R)
    m_pad = round_up(max(m, 1), C)
    rows = csr.row_of_entry()
    cols = csr.indices.astype(np.int64)
    vals = csr.data

    rb = rows // R
    cb = cols // C
    order = np.lexsort((cb, rb))
    rows, cols, vals, rb, cb = rows[order], cols[order], vals[order], rb[order], cb[order]

    # tile boundaries: new tile when (rb, cb) changes or T entries reached
    key = rb * (m_pad // C) + cb
    new_block = np.empty(key.size, dtype=bool)
    if key.size:
        new_block[0] = True
        new_block[1:] = key[1:] != key[:-1]
    # position within block
    block_start = np.maximum.accumulate(np.where(new_block, np.arange(key.size), 0))
    pos_in_block = np.arange(key.size) - block_start
    tile_of_entry_in_block = pos_in_block // T
    # unique tile key
    tile_key = key * 100_000 + tile_of_entry_in_block
    uniq, tile_idx = np.unique(tile_key, return_inverse=True)
    n_tiles = max(uniq.size, 1)
    slot = pos_in_block % T

    tvals = np.zeros((n_tiles, T), dtype=np.float64)
    tlrow = np.zeros((n_tiles, T), dtype=np.int32)
    tlcol = np.zeros((n_tiles, T), dtype=np.int32)
    tvals[tile_idx, slot] = vals
    tlrow[tile_idx, slot] = (rows % R).astype(np.int32)
    tlcol[tile_idx, slot] = (cols % C).astype(np.int32)
    # Mosaic-friendly 3D layout
    tvals = tvals.reshape(n_tiles, 8, T // 8)
    tlrow = tlrow.reshape(n_tiles, 8, T // 8)
    tlcol = tlcol.reshape(n_tiles, 8, T // 8)

    t_rb = np.zeros(n_tiles, dtype=np.int32)
    t_cb = np.zeros(n_tiles, dtype=np.int32)
    t_rb[tile_idx] = rb.astype(np.int32)
    t_cb[tile_idx] = cb.astype(np.int32)
    # tiles from np.unique are sorted by tile_key = (rb-major) — required for
    # in-VMEM output accumulation
    first = np.empty(n_tiles, dtype=np.int32)
    first[0] = 1
    first[1:] = (t_rb[1:] != t_rb[:-1]).astype(np.int32)

    return OneHotTiles(
        vals=jnp.asarray(tvals, jnp.float32),
        lrow=jnp.asarray(tlrow),
        lcol=jnp.asarray(tlcol),
        tile_rb=jnp.asarray(t_rb),
        tile_cb=jnp.asarray(t_cb),
        tile_first=jnp.asarray(first),
        n_pad=n_pad,
        m_pad=m_pad,
        shape=(n, m),
        R=R, C=C, T=T,
    )


def _spmm_kernel(rb_ref, cb_ref, first_ref, vals_ref, lrow_ref, lcol_ref, x_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    T = lcol_ref.shape[1] * lcol_ref.shape[2]
    lcol = lcol_ref[0].reshape(T)
    lrow = lrow_ref[0].reshape(T)
    vals = vals_ref[0].reshape(T)
    C = x_ref.shape[0]
    R = out_ref.shape[0]

    ohc = (lcol[:, None] == jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)).astype(jnp.bfloat16)
    g = jnp.dot(ohc, x_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    p = vals[:, None] * g
    ohr = (lrow[:, None] == jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)).astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        ohr, p.astype(jnp.bfloat16), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


@jax.jit
def onehot_spmm(tiles: OneHotTiles, X: jax.Array) -> jax.Array:
    """Y = A @ X with X: (m_pad, B) f32.  Returns (n_pad, B)."""
    R, C, T = tiles.R, tiles.C, tiles.T
    B = X.shape[1]
    n_tiles = tiles.n_tiles

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, T // 8), lambda i, rb, cb, first: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, T // 8), lambda i, rb, cb, first: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, T // 8), lambda i, rb, cb, first: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B), lambda i, rb, cb, first: (cb[i], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, B), lambda i, rb, cb, first: (rb[i], 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles.n_pad, B), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * T * (C + R) * B,
            bytes_accessed=n_tiles * T * 12 + tiles.m_pad * B * 4 + tiles.n_pad * B * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(tiles.tile_rb, tiles.tile_cb, tiles.tile_first, tiles.vals, tiles.lrow, tiles.lcol, X)


# pytree registration so tiles can be passed through jit as an argument
jax.tree_util.register_pytree_node(
    OneHotTiles,
    lambda t: (
        (t.vals, t.lrow, t.lcol, t.tile_rb, t.tile_cb, t.tile_first),
        (t.n_pad, t.m_pad, t.shape, t.R, t.C, t.T),
    ),
    lambda aux, ch: OneHotTiles(*ch, n_pad=aux[0], m_pad=aux[1], shape=aux[2], R=aux[3], C=aux[4], T=aux[5]),
)
