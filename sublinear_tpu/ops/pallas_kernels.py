"""Pallas TPU kernels for the solver hot paths.

Replaces the reference's hand-tuned native kernels (8-way unrolled unsafe CSR
matvec /root/reference/src/ultra_fast.rs:49-97, AVX2 SIMD matvec
/root/reference/src/simd_ops.rs:20-91) with TPU-resident fused iteration
kernels:

  - ``dense_neumann_fused``: runs T Neumann-series iterations with the WHOLE
    operator pinned in VMEM.  One pallas_call = T matvecs on the MXU with
    zero HBM re-streaming of A and zero per-iteration dispatch — the memory
    traffic XLA's while_loop pays (A re-read from HBM every matvec) is paid
    once.  Fits n_pad <= 1536 in f32 (A: n_pad^2 * 4B <= ~9.4 MB of the
    16 MB/core VMEM budget).
  - ``dense_jacobi_fused``: same structure for the Jacobi iteration.
  - ``dense_power_fused``: fused PageRank power iterations (P^T resident).

All kernels run in interpret mode on CPU for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget: A(n^2) + vectors; 1536^2*4 = 9.4MB leaves room for x/term/b
FUSED_MAX_NPAD = 1536


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _neumann_kernel(iters: int, a_ref, diag_ref, dinv_ref, b_ref, x0_ref, x_ref):
    """x = x0 + sum_{k=0..iters-1} M^k D^-1 r0,  M = I - D^-1 A, r0 = b - A x0."""
    a = a_ref[:]
    dinv = dinv_ref[:]
    diag = diag_ref[:]
    r0 = b_ref[:] - jnp.dot(a, x0_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    term0 = dinv * r0

    def body(_, carry):
        x, term = carry
        at = jnp.dot(a, term, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
        term = -dinv * (at - diag * term)
        return x + term, term

    x, term = jax.lax.fori_loop(0, iters, body, (x0_ref[:] + term0, term0))
    x_ref[:] = x


@functools.partial(jax.jit, static_argnames=("iters",))
def dense_neumann_fused(a, diag, inv_diag, b, x0, iters: int = 16):
    """T fused Neumann iterations.  a: (n_pad, n_pad); vectors: (n_pad, B)."""
    n = a.shape[0]
    kernel = functools.partial(_neumann_kernel, iters)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A resident for all iters
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * b.shape[1] * (iters + 1),
            bytes_accessed=n * n * 4 + 4 * n * b.shape[1] * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(a, diag, inv_diag, b, x0)


def _jacobi_kernel(iters: int, a_ref, diag_ref, dinv_ref, b_ref, x0_ref, x_ref):
    a = a_ref[:]
    dinv = dinv_ref[:]
    diag = diag_ref[:]
    b = b_ref[:]

    def body(_, x):
        ax = jnp.dot(a, x, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
        return dinv * (b - (ax - diag * x))

    x_ref[:] = jax.lax.fori_loop(0, iters, body, x0_ref[:])


@functools.partial(jax.jit, static_argnames=("iters",))
def dense_jacobi_fused(a, diag, inv_diag, b, x0, iters: int = 16):
    kernel = functools.partial(_jacobi_kernel, iters)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(a, diag, inv_diag, b, x0)


def _power_kernel(iters: int, alpha, pt_ref, v_ref, dang_ref, x_ref):
    """PageRank power iterations with P^T resident in VMEM.
    x <- (1-a) v + a (P^T x + (dangling . x) v)."""
    pt = pt_ref[:]
    v = v_ref[:]
    dang = dang_ref[:]

    def body(_, x):
        ptx = jnp.dot(pt, x, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
        mass = jnp.sum(dang * x)
        return (1.0 - alpha) * v + alpha * (ptx + mass * v)

    x_ref[:] = jax.lax.fori_loop(0, iters, body, v)


@functools.partial(jax.jit, static_argnames=("iters", "alpha"))
def dense_power_fused(pt, v, dangling, alpha: float, iters: int = 32):
    kernel = functools.partial(_power_kernel, iters, float(alpha))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(pt, v, dangling)


# --------------------------------------------------------------- bf16x3 path
# HIGHEST-precision f32 matmuls exceed VMEM beyond n_pad=768 (the compiler
# stages multiple passes).  For larger operators we split A = A_hi + A_lo into
# two bf16 halves host-side and run the classic 3-pass product
# A t = A_hi t_hi + A_hi t_lo + A_lo t_hi  (error ~5e-6 relative per matvec),
# which keeps the VMEM footprint at the f32 size (2 x 2B copies).

def split_bf16(a):
    a = jnp.asarray(a, jnp.float32)
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a_hi, a_lo, t):
    th = t.astype(jnp.bfloat16)
    tl = (t - th.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    return d(a_hi, th) + d(a_hi, tl) + d(a_lo, th)


def _neumann3_kernel(iters: int, ah_ref, al_ref, diag_ref, dinv_ref, b_ref, x0_ref, x_ref):
    ah, al = ah_ref[:], al_ref[:]
    dinv = dinv_ref[:]
    diag = diag_ref[:]
    r0 = b_ref[:] - _dot3(ah, al, x0_ref[:])
    term0 = dinv * r0

    def body(_, carry):
        x, term = carry
        at = _dot3(ah, al, term)
        term = -dinv * (at - diag * term)
        return x + term, term

    x, term = jax.lax.fori_loop(0, iters, body, (x0_ref[:] + term0, term0))
    x_ref[:] = x


@functools.partial(jax.jit, static_argnames=("iters",))
def dense_neumann_fused_bf16x3(a_hi, a_lo, diag, inv_diag, b, x0, iters: int = 16):
    kernel = functools.partial(_neumann3_kernel, iters)
    n = a_hi.shape[0]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * n * n * b.shape[1] * (iters + 1),
            bytes_accessed=n * n * 4 + 4 * n * b.shape[1] * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(a_hi, a_lo, diag, inv_diag, b, x0)


# HIGHEST-precision f32 matmul staging fits in VMEM up to here
FUSED_HIGHEST_MAX_NPAD = 768


def fused_supported(op) -> bool:
    """Is the fused VMEM-resident path applicable to this operator?"""
    from ..formats.ell import DenseOperator

    return isinstance(op, DenseOperator) and op.n_pad <= FUSED_MAX_NPAD and op.n_pad == op.m_pad
