"""Convergence-checked solver driver over the fused Pallas kernels.

The Pallas kernels (ops/pallas_kernels.py) run a fixed block of iterations
with the operator resident in VMEM; this driver wraps them in an on-device
``lax.while_loop`` that measures the true residual between blocks — the same
check_every pattern as the XLA-path solvers, at kernel granularity.

Variant selection: HIGHEST-precision f32 matmuls up to n_pad=768 (VMEM
staging limit), bf16x3 split-operator product up to FUSED_MAX_NPAD.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..matrix import Matrix
from ..ops import pallas_kernels as pk
from ..types import SolverOptions, SolverResult
from . import base


@functools.partial(jax.jit, static_argnames=("block", "variant"))
def _fused_neumann_run(op, ah, al, b_col, x0_col, threshold, max_iters, block, variant):
    diag = op.diag[:, None]
    dinv = op.inv_diag[:, None]

    def kernel_block(x):
        if variant == "bf16x3":
            return pk.dense_neumann_fused_bf16x3(ah, al, diag, dinv, b_col, x, iters=block)
        return pk.dense_neumann_fused(op.data, diag, dinv, b_col, x, iters=block)

    def residual_of(x):
        return jnp.linalg.norm(op.matvec(x[:, 0]) - b_col[:, 0])

    def cond(carry):
        x, k, res = carry
        return (res > threshold) & (k < max_iters) & jnp.isfinite(res) & (res < base.HUGE_RES)

    def body(carry):
        x, k, _ = carry
        x = kernel_block(x)
        return x, k + block, residual_of(x)

    x0 = x0_col
    carry = (kernel_block(x0), jnp.int32(block), jnp.asarray(0.0, b_col.dtype))
    carry = (carry[0], carry[1], residual_of(carry[0]))
    x, k, res = jax.lax.while_loop(cond, body, carry)
    return x[:, 0], k, res


def solve_neumann_fused(
    matrix: Matrix, b, options: SolverOptions, raise_on_fail: bool = True, block: int = 8
) -> SolverResult:
    op = matrix.op(options.dtype)
    if not pk.fused_supported(op):
        from .neumann import solve_neumann

        return solve_neumann(matrix, b, options, raise_on_fail)

    variant = "highest" if op.n_pad <= pk.FUSED_HIGHEST_MAX_NPAD else "bf16x3"
    if variant == "bf16x3":
        # bf16x3 products floor at ~1e-4 relative residual; route tighter
        # tolerances to the XLA while_loop path (full f32)
        nb = float(np.linalg.norm(np.asarray(b, dtype=np.float64)))
        rel_target = options.epsilon if options.convergence == "relative" else options.epsilon / max(nb, 1e-30)
        if rel_target < 1e-4:
            from .neumann import solve_neumann

            return solve_neumann(matrix, b, options, raise_on_fail)
        ah, al = pk.split_bf16(op.data)
    else:
        # placeholders with matching pytree structure (unused by the kernel)
        ah = al = jnp.zeros((1, 1), jnp.bfloat16)

    b_pad = matrix.pad_vector(b, options.dtype)
    x0 = (
        matrix.pad_vector(options.x0, options.dtype)
        if options.x0 is not None
        else jnp.zeros_like(b_pad)
    )
    threshold = base.threshold_for(b, options)

    with base.SolveTimer() as t:
        x, k, res = _fused_neumann_run(
            op, ah, al, b_pad[:, None], x0[:, None], threshold,
            jnp.int32(options.max_iterations), block, variant,
        )
        jax.block_until_ready(x)
    result = base.finalize(
        matrix, x, k, res, f"neumann-fused-{variant}", options, t.ms,
        matvec_count=int(jax.device_get(k)),
    )
    return base.check_outcome(result, threshold, options, raise_on_fail)
