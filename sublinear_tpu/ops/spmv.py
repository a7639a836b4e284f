"""Sparse matrix-vector / matrix-matrix product kernels (TPU-first).

This is the universal hot kernel of the whole framework: every solver's inner
loop reduces to it (reference hot kernels: CSR matvec at
/root/reference/src/matrix/sparse.rs:187, the 8-way unrolled unsafe matvec at
/root/reference/src/ultra_fast.rs:49-97, the AVX2 SIMD matvec at
/root/reference/src/simd_ops.rs:20-91, and the TS CSR matvec at
/root/reference/src/mcp/tools/solver-optimized.ts:50-67).

TPU re-design (not a translation):
  * slot-major ELL: ``values``/``cols`` of shape (K, n_pad) with the row axis
    on the 128-lane minor dimension.  One SpMV = K full-width vector gathers
    ``x[cols[k]]`` + fused multiply-accumulate on the VPU — no scalar loops,
    no data-dependent shapes, fully fusable by XLA.
  * COO tail for hub rows (power-law degree): entries beyond the ELL slot cap
    go to a flat COO block reduced with ``segment_sum`` (sorted rows).
  * dense path: small/dense operators use the MXU via ``jnp.dot``; on TPU a
    dense n x n f32 matvec is HBM-bandwidth-bound and beats any gather-based
    path below a few thousand rows.

All functions operate in the *padded* domain: vectors have length
n_pad = round_up(n, 128) with zero padding; padded ELL slots point at column 0
with value 0, so no masking is needed inside the loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# All contractions use HIGHEST precision: on TPU the default f32 matmul
# runs single-pass bf16 on the MXU (~3e-3 relative error), which stalls
# solver residuals around 1e-1 absolute — measured, not hypothetical.
_PREC = jax.lax.Precision.HIGHEST


def ell_matvec(values: jax.Array, cols: jax.Array, x: jax.Array) -> jax.Array:
    """y = A @ x for slot-major ELL. values/cols: (K, n_pad); x: (m_pad,)."""
    # gather -> (K, n_pad); FMA and reduce over slots
    gathered = jnp.take(x, cols, axis=0)
    return jnp.einsum("kn,kn->n", values, gathered, precision=_PREC)


# The TPU gather engine costs ~16 ns per index for single-float payloads but
# only ~5 ns per index when each index fetches a row of >= 8 floats (measured,
# see ARCHITECTURE.md).  For large gather volumes we therefore embed x as
# column 0 of an 8-wide container and gather rows; the 7 auxiliary columns
# carry operator-resident junk weighted by 1e-30 so XLA cannot slice the
# gather back down to one column.
WIDE_GATHER_THRESHOLD = 1 << 17  # gather count above which the wide path wins


def ell_matvec_wide(values: jax.Array, cols: jax.Array, x: jax.Array, aux: jax.Array) -> jax.Array:
    """Single-RHS SpMV through an 8-wide row-gather container (~3.6x faster
    than the narrow gather at large nnz)."""
    X = jnp.concatenate([x[:, None], aux], axis=1)      # (m_pad, 8)
    gathered = jnp.take(X, cols, axis=0)                # (K, n_pad, 8)
    w = jnp.concatenate(
        [jnp.ones((1,), x.dtype), jnp.full((aux.shape[1],), 1e-30, x.dtype)]
    )
    return jnp.einsum("kns,s,kn->n", gathered, w, values, precision=_PREC)


def ell_matmat(values: jax.Array, cols: jax.Array, X: jax.Array) -> jax.Array:
    """Y = A @ X for batched RHS.  X: (m_pad, B) -> (n_pad, B).

    Replaces the reference's sequential batch solve loop
    (/root/reference/src/mcp/tools/solver.ts:291-321) with one fused product.

    take+einsum measured BEST on device among five formulations (einsum
    5.48, slot-scan 8.35, grouped scans 6.2-6.6, add-tree 6.56 ms/SpMM at
    n=100k/K=27/B=128, device-span timed — scratch/prof_r5_spmm3.py): XLA's
    materialized gather feeds a well-pipelined reduce, while running-
    accumulator forms pay the (n,B) accumulator round-trip per slot.
    """
    gathered = jnp.take(X, cols, axis=0)  # (K, n_pad, B)
    return jnp.einsum("kn,knb->nb", values, gathered, precision=_PREC)


def ell_matmat_bmajor(values: jax.Array, cols: jax.Array, XT: jax.Array) -> jax.Array:
    """YT = (A @ X)^T for batch-major RHS.  XT: (B, m_pad) -> (B, n_pad).

    The batch-major layout gathers along LANES (XT[:, col]) instead of rows:
    measured 3.03 vs 3.97 ms/SpMM at n=100k/K=12/B=128 (24% — the gather
    engine moves lane-direction elements faster than 512-byte row DMAs;
    scratch/prof_r5_spmm4.py).  The batched Neumann/CG drivers keep ALL
    iteration state in this layout; only solve entry/exit transposes."""
    g = jnp.take(XT, cols, axis=1)        # (B, K, n_pad)
    return jnp.einsum("kn,bkn->bn", values, g, precision=_PREC)


def coo_matmat_bmajor(
    vals: jax.Array, rows: jax.Array, cols: jax.Array, XT: jax.Array, n_pad: int
) -> jax.Array:
    """Tail product in batch-major layout: (B, m_pad) -> (B, n_pad)."""
    prod = vals[None, :] * jnp.take(XT, cols, axis=1)   # (B, T)
    yT = jax.ops.segment_sum(prod.T, rows, num_segments=n_pad,
                             indices_are_sorted=True)   # (n_pad, B)
    return yT.T


def coo_matvec(
    vals: jax.Array, rows: jax.Array, cols: jax.Array, x: jax.Array, n_pad: int
) -> jax.Array:
    """Tail COO product via segment_sum (rows sorted ascending at pack time)."""
    prod = vals * jnp.take(x, cols, axis=0)
    return jax.ops.segment_sum(
        prod, rows, num_segments=n_pad, indices_are_sorted=True
    )


def coo_matmat(
    vals: jax.Array, rows: jax.Array, cols: jax.Array, X: jax.Array, n_pad: int
) -> jax.Array:
    prod = vals[:, None] * jnp.take(X, cols, axis=0)
    return jax.ops.segment_sum(
        prod, rows, num_segments=n_pad, indices_are_sorted=True
    )


def dense_matvec(data: jax.Array, x: jax.Array) -> jax.Array:
    return jnp.dot(data, x, preferred_element_type=data.dtype, precision=_PREC)


def dense_matmat(data: jax.Array, X: jax.Array) -> jax.Array:
    return jnp.dot(data, X, preferred_element_type=data.dtype, precision=_PREC)
