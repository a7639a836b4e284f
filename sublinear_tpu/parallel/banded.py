"""Ring-halo distributed CG for banded (DIA) operators.

SURVEY.md §5.8 names two collective patterns beyond all_gather/psum:
`all_to_all` walker re-bucketing (parallel/graph_sharded.py) and a
**ppermute ring halo** for banded structure — this module.  Reference role:
the banded fast path of /root/reference/src/matrix/optimized.rs:397-449,
scaled out.

For a matrix whose diagonals span offsets in [-h, +h], a row shard only ever
reads x-entries owned by itself and its two ring neighbors.  Instead of
all_gathering the full O(n) iterate every iteration (comm = n·4 bytes/chip),
each CG step exchanges TWO h-element edge slabs via `lax.ppermute`
(comm = 2·h·4 bytes/chip, independent of n) — the halo rides ICI
neighbor-to-neighbor and overlaps with the local diagonal FMAs.

Wrap-around safety: DIA packing (formats/dia.py dia_from_csr) stores zero
coefficients wherever row+offset falls outside the matrix, so the circular
halo a global-edge shard receives is multiplied by zero — no masking needed
inside the hot loop.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

from ..config import LANE, round_up
from ..formats import dia as _dia
from ..formats import ell as _ell
from ..matrix import Matrix
from ..solvers import base
from ..types import SolverOptions, SolverResult
from ..utils.lru import LRUCache
from . import mesh as mesh_mod
from .mesh import ROWS

_RING_CACHE = LRUCache(maxsize=16)


def _ring_cg_factory(mesh: Mesh, offsets: tuple, h: int):
    """shard_map CG whose matvec exchanges only the 2h-row ring halo."""
    D = int(mesh.shape[ROWS])
    fwd = [(i, (i + 1) % D) for i in range(D)]  # my right edge -> right nbr
    bwd = [(i, (i - 1) % D) for i in range(D)]  # my left edge  -> left nbr

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, ROWS),          # DIA data (ndiags, n_loc)
            P(ROWS), P(ROWS),       # inv_diag, b_l
            P(ROWS),                # x0_l
            P(), P(),               # threshold, max_iters
        ),
        out_specs=(P(ROWS), P(), P()),
        check_vma=False,
    )
    def cg_shard(data_l, invd_l, b_l, x0_l, threshold, max_iters):
        n_loc = b_l.shape[0]

        def matvec(x_l):
            if D > 1:
                from_left = jax.lax.ppermute(x_l[-h:], ROWS, fwd)
                from_right = jax.lax.ppermute(x_l[:h], ROWS, bwd)
            else:
                from_left = x_l[-h:]
                from_right = x_l[:h]
            x_ext = jnp.concatenate([from_left, x_l, from_right])
            y = jnp.zeros(n_loc, x_l.dtype)
            for d, off in enumerate(offsets):  # static unroll, ndiags <= 128
                seg = jax.lax.dynamic_slice_in_dim(x_ext, h + off, n_loc)
                y = y + data_l[d] * seg
            return y

        def pdot(a, b):
            return jax.lax.psum(jnp.vdot(a, b), ROWS)

        r_l = b_l - matvec(x0_l)
        z_l = invd_l * r_l
        p_l = z_l
        rz0 = pdot(r_l, z_l)
        res0 = jnp.sqrt(pdot(r_l, r_l))

        def cond(carry):
            x_l, r_l, p_l, rz, k, res = carry
            return ((res > threshold) & (k < max_iters)
                    & jnp.isfinite(res) & (res < base.HUGE_RES))

        def body(carry):
            x_l, r_l, p_l, rz, k, _ = carry
            Ap_l = matvec(p_l)
            pAp = pdot(p_l, Ap_l)
            alpha = rz / jnp.maximum(pAp, 1e-30)
            x_l = x_l + alpha * p_l
            r_l = r_l - alpha * Ap_l
            z_l = invd_l * r_l
            rz_new = pdot(r_l, z_l)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p_l = z_l + beta * p_l
            res = jnp.sqrt(pdot(r_l, r_l))
            return x_l, r_l, p_l, rz_new, k + 1, res

        carry0 = (x0_l, r_l, p_l, rz0, jnp.int32(0), res0)
        x_l, r_l, p_l, rz, k, res = jax.lax.while_loop(cond, body, carry0)
        return x_l, k, res

    return jax.jit(cg_shard)


def _ring_program(matrix: Matrix, b, mesh: Mesh, options: SolverOptions):
    """Build the ring-CG program + concrete device args for (matrix, b, mesh).
    Shared by the solver and the HLO-inspection path."""
    D = int(mesh.shape[ROWS])
    n = matrix.shape[0]

    offs = _dia.dia_offsets(matrix.csr)
    if offs is None:
        from ..errors import InvalidMatrixError

        raise InvalidMatrixError(
            "ring-halo CG requires a banded (DIA-representable) matrix; "
            "use solve_cg_sharded for general sparsity")
    op = _dia.dia_from_csr(matrix.csr, options.dtype, offsets=offs)
    offsets = tuple(int(o) for o in op.offsets)
    h = max(max(abs(o) for o in offsets), 1)

    # pad rows so every shard holds an equal lane-aligned block of >= h rows
    n_pad = round_up(max(op.n_pad, h * D), LANE * D)
    pad = n_pad - op.n_pad
    data = jnp.pad(op.data, ((0, 0), (0, pad)))
    inv_diag = jnp.pad(op.inv_diag, (0, pad))

    vec_sh = NamedSharding(mesh, P(ROWS))
    dia_sh = NamedSharding(mesh, P(None, ROWS))
    b_full = _ell.pad_vector(np.asarray(b, dtype=np.float64), n_pad, op.dtype)
    x0_np = np.zeros(n_pad) if options.x0 is None else np.pad(
        np.asarray(options.x0, dtype=np.float64), (0, n_pad - n))
    threshold = base.threshold_for(b, options)

    key = (tuple(mesh.shape.items()), tuple(d.id for d in mesh.devices.flat),
           offsets, h, "ring-cg")
    fn = _RING_CACHE.get(key)
    if fn is None:
        fn = _RING_CACHE.put(key, _ring_cg_factory(mesh, offsets, h))
    args = (
        jax.device_put(data, dia_sh),
        jax.device_put(inv_diag, vec_sh),
        jax.device_put(b_full, vec_sh),
        jax.device_put(jnp.asarray(x0_np, op.dtype), vec_sh),
        jnp.asarray(threshold, op.dtype), jnp.int32(options.max_iterations),
    )
    meta = {"D": D, "h": h, "n_pad": n_pad, "ndiags": data.shape[0],
            "dtype": op.dtype, "threshold": threshold}
    return fn, args, meta


def lower_ring_cg_text(matrix: Matrix, b, mesh: Optional[Mesh] = None,
                       options: Optional[SolverOptions] = None) -> str:
    """Optimized-HLO text of the compiled ring CG — lets tests assert the
    halo exchange is collective-permute-only (no all-gather)."""
    options = options or SolverOptions()
    mesh = mesh or mesh_mod.make_mesh()
    fn, args, _ = _ring_program(matrix, b, mesh, options)
    return fn.lower(*args).compile().as_text()


def solve_cg_banded_sharded(
    matrix: Matrix,
    b,
    mesh: Optional[Mesh] = None,
    options: Optional[SolverOptions] = None,
    raise_on_fail: bool = True,
) -> SolverResult:
    """Distributed Jacobi-preconditioned CG with O(bandwidth) comm/iteration.

    Requires a DIA-representable matrix (formats/dia.py dia_offsets); raises
    InvalidMatrixError otherwise — callers with general sparsity use
    solve_cg_sharded (split-block all_gather halo)."""
    options = options or SolverOptions()
    mesh = mesh or mesh_mod.make_mesh()
    fn, args, meta = _ring_program(matrix, b, mesh, options)
    D, h, n_pad = meta["D"], meta["h"], meta["n_pad"]
    threshold = meta["threshold"]
    with base.SolveTimer() as t:
        x, k, res = fn(*args)
        jax.block_until_ready(x)

    result = base.finalize(
        matrix, x, k, res, "cg-sharded-ring", options, t.ms,
        matvec_count=int(jax.device_get(k)) + 1,
    )
    itemsize = np.dtype(meta["dtype"]).itemsize
    result.distribution = {
        "shards": D,
        "bytes_per_shard": int(meta["ndiags"] * (n_pad // D) * itemsize
                               + 4 * (n_pad // D) * itemsize),
        "comm_bytes_per_iter": int(2 * h * itemsize),  # two ppermute slabs
        "halo_rows": int(h),
    }
    return base.check_outcome(result, threshold, options, raise_on_fail)
