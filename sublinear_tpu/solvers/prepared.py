"""PreparedSolver — compile-once, solve-many serving fast path.

Parity: the reference's ``SolverSession`` (server/session-manager.js:320) and
the WASM ``WasmSublinearSolver`` instance API (wasm_iface.rs:45-244) hold a
matrix and serve repeated solves.  Here preparation pins the device operator,
resolves the method once, pre-compiles the program, and each ``solve(b)``
costs only the RHS transfer + one dispatch — the per-call analysis/padding
overhead of the functional ``slt.solve`` is gone.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..matrix import Matrix
from ..types import Method, SolverOptions, SolverResult, parse_method
from . import base


class PreparedSolver:
    def __init__(self, matrix: Matrix, method: str = "adaptive",
                 options: Optional[SolverOptions] = None):
        from .dispatch import select_method

        self.matrix = matrix
        self.options = options or SolverOptions()
        m = parse_method(method)
        if m == Method.ADAPTIVE:
            m = select_method(matrix)
        self.method = m
        self.op = matrix.op(self.options.dtype)
        self._norm_b_scale = 1.0
        self._runner = self._build_runner()
        # pre-compile with a dummy RHS
        self.solve(np.zeros(matrix.shape[0]))

    def _build_runner(self):
        from . import cg as _cg
        from . import chebyshev as _cheb
        from . import jacobi as _jacobi
        from . import neumann as _neumann
        from . import push as _push
        from ..analysis import analyze

        opts = self.options
        m = self.method
        if m == Method.CG:
            m = Method.CG if analyze(self.matrix, estimate_condition=False).is_symmetric else Method.BICGSTAB

        if m == Method.NEUMANN:
            return lambda op, b, x0, thr: _neumann._neumann_run(
                op, b, x0, thr, jnp.int32(opts.max_iterations), opts.check_every,
                base.norm_mode_of(opts))
        if m == Method.JACOBI:
            return lambda op, b, x0, thr: _jacobi._jacobi_run(
                op, b, x0, thr, jnp.int32(opts.max_iterations), opts.check_every,
                base.norm_mode_of(opts))
        if m == Method.CG:
            return lambda op, b, x0, thr: _cg._cg_run(
                op, b, x0, thr, jnp.int32(opts.max_iterations), True)
        if m == Method.BICGSTAB:
            return lambda op, b, x0, thr: _cg._bicgstab_run(
                op, b, x0, thr, jnp.int32(opts.max_iterations))
        if m in (Method.FORWARD_PUSH, Method.BACKWARD_PUSH):
            return lambda op, b, x0, thr: _push._push_run(
                op, b, x0, thr, jnp.int32(opts.max_iterations), opts.check_every,
                base.norm_mode_of(opts))
        if m == Method.CHEBYSHEV:
            rho = min(max(float(analyze(self.matrix, estimate_condition=False)
                                .spectral_radius_estimate or 0.9), 1e-3), 0.999)
            return lambda op, b, x0, thr: _cheb._chebyshev_run(
                op, b, x0, rho, thr, jnp.int32(opts.max_iterations), opts.check_every,
                base.norm_mode_of(opts))
        from ..errors import InvalidParametersError

        raise InvalidParametersError(
            f"PreparedSolver supports direct iterative methods, not {m}"
        )

    def solve(self, b, x0: Optional[np.ndarray] = None) -> SolverResult:
        opts = self.options
        b_pad = self.matrix.pad_vector(b, opts.dtype)
        x0_pad = (
            self.matrix.pad_vector(x0, opts.dtype) if x0 is not None else jnp.zeros_like(b_pad)
        )
        threshold = base.threshold_for(b, opts)
        with base.SolveTimer() as t:
            out = self._runner(self.op, b_pad, x0_pad, threshold)
            x, k, res = out[0], out[1], out[2]  # runners return (..., change)
            jax.block_until_ready(x)
        result = base.finalize(
            self.matrix, x, k, res, self.method.value, opts, t.ms,
            matvec_count=int(jax.device_get(k)),
        )
        return base.check_outcome(result, threshold, opts, raise_on_fail=False)
