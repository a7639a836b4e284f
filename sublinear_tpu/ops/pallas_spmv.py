"""Tiled one-hot SpMM Pallas kernel — the MXU path for batched large-n SpMV.

Motivation (ARCHITECTURE.md): XLA's TPU gather costs ~16 cycles per element,
making single-RHS large-n SpMV slower than a SIMD CPU.  This kernel re-routes
both the gather AND the scatter through the MXU.  Entries are tiled by
(row-block, col-block); inside a tile the gather+multiply is one matmul with
a transposed *valued* one-hot,

    W[c, t] = vals[t] * (lcol[t] == c)          (C, T)  bf16, built on VPU
    P       = W^T-contract X_block              (T, B) = dot(W, X; contract C)

and the row scatter is a second one-hot matmul

    OUT    += OH_r @ P,   OH_r[r, t] = (lrow[t] == r)    (R, T) @ (T, B).

Mosaic layout notes (learned the hard way):
  - entry vectors live on the LANE axis as (1, 1, T) blocks; every one-hot is
    built by broadcasting them along SUBLANES (no lane->sublane relayout,
    no reshapes — Mosaic rejects (8,128)->(1024,) shape casts);
  - the tile block shape (1, 1, T) satisfies the (8, 128) tiling rule because
    leading 1s match the array dims and T is a multiple of 128.

Tiles are routed by scalar-prefetched (row-block, col-block) ids; consecutive
tiles share the same output block, zeroed on first visit and accumulated in
VMEM.  Host-side packing: build_tiles() — entries sorted by (rb, cb), padded
to T-entry tiles (pad entries carry val=0).
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

TILE_R = 1024
TILE_C = 1024
TILE_T = 512  # entries per tile; any multiple of 128


@dataclasses.dataclass
class OneHotTiles:
    vals: jax.Array      # (n_tiles, 1, T) f32
    lrow: jax.Array      # (n_tiles, 1, T) i32 in [0, R)
    lcol: jax.Array      # (n_tiles, 1, T) i32 in [0, C)
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
    block_start = np.maximum.accumulate(np.where(new_block, np.arange(key.size), 0))
    pos_in_block = np.arange(key.size) - block_start
    tile_of_entry_in_block = pos_in_block // T
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

    t_rb = np.zeros(n_tiles, dtype=np.int32)
    t_cb = np.zeros(n_tiles, dtype=np.int32)
    t_rb[tile_idx] = rb.astype(np.int32)
    t_cb[tile_idx] = cb.astype(np.int32)
    # tiles from np.unique are sorted by tile_key (rb-major) — required for
    # in-VMEM output accumulation
    first = np.empty(n_tiles, dtype=np.int32)
    first[0] = 1
    first[1:] = (t_rb[1:] != t_rb[:-1]).astype(np.int32)

    return OneHotTiles(
        vals=jnp.asarray(tvals[:, None, :], jnp.float32),
        lrow=jnp.asarray(tlrow[:, None, :]),
        lcol=jnp.asarray(tlcol[:, None, :]),
        tile_rb=jnp.asarray(t_rb),
        tile_cb=jnp.asarray(t_cb),
        tile_first=jnp.asarray(first),
        n_pad=n_pad,
        m_pad=m_pad,
        shape=(n, m),
        R=R, C=C, T=T,
    )


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _spmm_kernel(precise, rb_ref, cb_ref, first_ref, vals_ref, lrow_ref, lcol_ref, x_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lcol = lcol_ref[0]  # (1, T) — lane-resident
    lrow = lrow_ref[0]
    vals = vals_ref[0]
    T = lcol.shape[-1]
    C = x_ref.shape[0]
    R = out_ref.shape[0]

    iota_ct = jax.lax.broadcasted_iota(jnp.int32, (C, T), 0)
    iota_rt = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0)
    # row one-hot is 0/1: EXACT in bf16
    ohr = (iota_rt == lrow).astype(jnp.bfloat16)

    def dg(a, b, ca, cb):
        return jax.lax.dot_general(
            a, b, (((ca,), (cb,)), ((), ())), preferred_element_type=jnp.float32
        )

    if not precise:
        # fast single-pass: ~3e-3 relative error (bf16 rounding of vals/X/P)
        w = jnp.where(iota_ct == lcol, vals, 0.0).astype(jnp.bfloat16)
        p = dg(w, x_ref[:].astype(jnp.bfloat16), 0, 0)
        out_ref[:] += dg(ohr, p.astype(jnp.bfloat16), 1, 0)
        return

    # solver-grade split-precision path (~1e-6 relative error): split the
    # valued one-hot and X into bf16 hi/lo halves, 3-pass gather product
    # W X = Wh Xh + Wh Xl + Wl Xh, then an exact-one-hot scatter of the f32
    # product split into hi/lo (5 matmuls total; MXU-bound either way).
    w32 = jnp.where(iota_ct == lcol, vals, 0.0)
    wh, wl = _split_bf16(w32)
    xh, xl = _split_bf16(x_ref[:])
    p = dg(wh, xh, 0, 0) + dg(wh, xl, 0, 0) + dg(wl, xh, 0, 0)   # (T, B) f32
    ph, plo = _split_bf16(p)
    out_ref[:] += dg(ohr, ph, 1, 0) + dg(ohr, plo, 1, 0)


@functools.partial(jax.jit, static_argnames=("precise",))
def onehot_spmm(tiles: OneHotTiles, X: jax.Array, precise: bool = True) -> jax.Array:
    """Y = A @ X with X: (m_pad, B) f32.  Returns (n_pad, B).

    ``precise=True`` (default) runs the split-precision 5-matmul path at
    ~1e-6 relative error — usable inside 1e-6-tolerance solves.  False is
    the 2-matmul fast path (~3e-3, bf16)."""
    R, C, T = tiles.R, tiles.C, tiles.T
    B = X.shape[1]
    n_tiles = tiles.n_tiles

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda i, rb, cb, first: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda i, rb, cb, first: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda i, rb, cb, first: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B), lambda i, rb, cb, first: (cb[i], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, B), lambda i, rb, cb, first: (rb[i], 0), memory_space=pltpu.VMEM),
    )
    import functools as _ft

    return pl.pallas_call(
        _ft.partial(_spmm_kernel, precise),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles.n_pad, B), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(5 if precise else 2) * n_tiles * T * (C + R) * B,
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
