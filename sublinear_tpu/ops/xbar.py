"""Crossbar-routed sparse SpMV (XBAR) — the TPU large-n single-RHS kernel.

Replaces the reference's unrolled CSR matvec as the hot kernel for large
irregular sparse single-RHS solves (/root/reference/src/ultra_fast.rs:49-97,
/root/reference/src/simd_ops.rs:20-91).  The TPU has no scalar gather loop
worth using: XLA's gather engine costs ~8-16 ns/index, while the native
per-sublane lane gather (``tpu.dynamic_gather``, emitted by
``jnp.take_along_axis(t, i, axis=1)`` inside a Pallas kernel) moves one
element per lane per cycle — the same cost as an FMA (~177 Gelem/s measured
on v5e).  That primitive only gathers *within* a 128-lane sublane row, so an
arbitrary SpMV is routed through a fixed crossbar network built from lane
gathers and batched 128x128 transposes:

  x2d (Cm,128)                                  x[128*h + lo] = x2d[h, lo]
  G1  prod[p*Cm+h, l] = x2d[h, idx_src[..]] * val_src[..]   (lane gather)
  T1  (Bs,128,128).swapaxes(1,2)                            (cross sublane)
  G2  route lanes to dest-block positions                   (lane gather)
  T2  (Bs,128,128).transpose(2,1,0)                         (cross sublane)
  G3  route lanes to final (dest row, row-lane) slots       (lane gather)
  y2d (Cn,128) = sum over K dest slots (+ tiny COO tail)

Each sparse entry (r, c, v) is assigned a *route*: a source position
(plane p, chunk h=c>>7, lane ds) and a destination slot (k < K) with
drow = (r>>7)*K + k over the REAL row chunks (rh < ceil(n/128)),
ds = drow & 127, db = drow >> 7.  Routing feasibility
is a balls-into-bins problem solved at pack time by randomized rounds with
slot redraws (~0.5 load); the rare failures go to a sorted COO tail handled
by XLA segment_sum.  The db axis is banked in groups of 128 lanes (one G2/T2
pass per bank) so the dest capacity is not limited to 16384 rows.

Measured on one v5e (chain-differenced device time): 46 us/matvec at
n=10k/nnz=110k and 134 us at n=100k/nnz=1.1M — 8.2 Gnnz/s, ~37x over the
round-1 wide-gather ELL path.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import backend
from . import spmv

GRID_ROWS = 16384         # max rows per source/dest grid (128 blocks of 128)
MAX_BANKS = 4             # db-axis banks (each adds one G2+T2 pass)
ROUTE_LOAD = 3            # dest slots sized for ~1/3 load
RB = 1024                 # streamed row-block for gather kernels


def _interpret() -> bool:
    return backend() != "tpu"


def _gather_prod_kernel(x_ref, i_ref, v_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1) * v_ref[:]


def _gather_kernel(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)


def _g1_call(C: int, P: int):
    return pl.pallas_call(
        _gather_prod_kernel,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((C, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 128), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 128), lambda p: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 128), lambda p: (p, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P * C, 128), jnp.float32),
        interpret=_interpret(),
    )


def _g_call(rows: int):
    return pl.pallas_call(
        _gather_kernel,
        grid=(pl.cdiv(rows, RB),),
        in_specs=[
            pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=_interpret(),
    )


@jax.tree_util.register_pytree_node_class
class XbarOperator:
    """Crossbar-routed sparse operator (single-RHS optimized)."""

    def __init__(self, idx_src, val_src, idx2, idx3, tail_vals, tail_rows,
                 tail_cols, diag, inv_diag, *, shape, n_pad, m_pad, C_src,
                 C_dst, Rr, P, K, Bs, banks, nnz):
        self.idx_src = idx_src    # (P*C_src, 128) i32 — lane lo of gathered col
        self.val_src = val_src    # (P*C_src, 128) f32
        self.idx2 = idx2          # (banks, Bs*128, 128) i32
        self.idx3 = idx3          # (banks*16384, 128) i32
        self.tail_vals = tail_vals
        self.tail_rows = tail_rows
        self.tail_cols = tail_cols
        self.diag = diag          # (n_pad,)
        self.inv_diag = inv_diag  # (n_pad,)
        self.shape = shape
        self.n_pad = n_pad        # row space (dest), multiple of 16384
        self.m_pad = m_pad        # col space (source), multiple of 16384
        self.C_src = C_src
        self.C_dst = C_dst
        self.Rr = Rr              # real row chunks; dest rows = rh*K+k, rh<Rr
        self.P = P
        self.K = K
        self.Bs = Bs
        self.banks = banks
        self._nnz = nnz

    # pytree protocol
    def tree_flatten(self):
        children = (self.idx_src, self.val_src, self.idx2, self.idx3,
                    self.tail_vals, self.tail_rows, self.tail_cols,
                    self.diag, self.inv_diag)
        aux = (self.shape, self.n_pad, self.m_pad, self.C_src, self.C_dst,
               self.Rr, self.P, self.K, self.Bs, self.banks, self._nnz)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (shape, n_pad, m_pad, C_src, C_dst, Rr, P, K, Bs, banks, nnz) = aux
        return cls(*children, shape=shape, n_pad=n_pad, m_pad=m_pad,
                   C_src=C_src, C_dst=C_dst, Rr=Rr, P=P, K=K, Bs=Bs,
                   banks=banks, nnz=nnz)

    @property
    def dtype(self):
        return self.val_src.dtype

    @property
    def tail_nnz(self) -> int:
        return int(self.tail_vals.shape[0])

    @property
    def nnz(self) -> int:
        return self._nnz

    def matvec(self, x: jax.Array) -> jax.Array:
        C, P, K, Bs, banks = self.C_src, self.P, self.K, self.Bs, self.banks
        Hd = K * self.Rr
        x2d = x.astype(jnp.float32).reshape(C, 128)
        prod = _g1_call(C, P)(x2d, self.idx_src, self.val_src)
        t1 = prod.reshape(Bs, 128, 128).swapaxes(1, 2).reshape(Bs * 128, 128)
        g2 = _g_call(Bs * 128)
        t2s = []
        for t in range(banks):
            o2 = g2(t1, self.idx2[t]).reshape(Bs, 128, 128)
            t2 = o2.transpose(2, 1, 0)                  # (128,128,Bs)
            if Bs < 128:
                t2 = jnp.pad(t2, ((0, 0), (0, 0), (0, 128 - Bs)))
            t2s.append(t2.reshape(128 * 128, 128))
        t2_all = jnp.concatenate(t2s, axis=0) if banks > 1 else t2s[0]
        o3 = _g_call(banks * 16384)(t2_all, self.idx3)
        y2d = o3[:Hd].reshape(self.Rr, K, 128).sum(axis=1)
        if self.Rr < self.C_dst:
            y2d = jnp.pad(y2d, ((0, self.C_dst - self.Rr), (0, 0)))
        y = y2d.reshape(self.n_pad).astype(x.dtype)
        if self.tail_nnz:
            y = y + spmv.coo_matvec(self.tail_vals.astype(x.dtype),
                                    self.tail_rows, self.tail_cols, x,
                                    self.n_pad)
        return y

    def matmat(self, X: jax.Array) -> jax.Array:
        """Batched product via scan — the batch path should prefer the ELL
        operator (Matrix.op(batch=True)); this exists for completeness."""
        def step(_, col):
            return None, self.matvec(col)
        _, Y = jax.lax.scan(step, None, X.T)
        return Y.T

    def offdiag_matvec(self, x: jax.Array) -> jax.Array:
        return self.matvec(x) - self.diag * x

    def as_dense(self) -> jax.Array:  # pragma: no cover - debugging aid
        eye = jnp.eye(self.m_pad, dtype=self.dtype)
        return self.matmat(eye)


def _first_per_key(keys: np.ndarray) -> np.ndarray:
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    first = np.r_[True, ks[1:] != ks[:-1]]
    out = np.zeros(len(keys), dtype=bool)
    out[order[first]] = True
    return out


def xbar_feasible(n: int, m: int, nnz: int, max_count_h: int) -> bool:
    """Cheap feasibility probe used by operator selection."""
    if n <= 0 or m <= 0 or nnz == 0:
        return False
    m_pad = -(-m // GRID_ROWS) * GRID_ROWS
    C_src = m_pad // 128
    cap_s = GRID_ROWS // C_src
    P_min = -(-int(max_count_h) // 128) + 3
    if P_min > cap_s:
        return False
    # stage-2 capacity: Bs*128*Bd_total must hold nnz at <=0.55 load;
    # dest rows are compacted to real row chunks so Bd_total is only
    # bounded by the bank count.
    Bs = min(cap_s, max(P_min, 2)) * (C_src // 128)
    Bd_total = MAX_BANKS * 128
    return nnz <= 0.55 * Bs * 128 * Bd_total


def pack_xbar(rows, cols, vals, shape, diag=None, seed: int = 12345,
              rounds: int = 80):
    """Build an XbarOperator from COO triplets, or return None if the
    routing grids cannot host this matrix (caller falls back to ELL).

    rows/cols: int64 arrays; vals: float array; shape: (n, m).
    """
    n, m = shape
    rows = np.asarray(rows, dtype=np.int64).ravel()
    cols = np.asarray(cols, dtype=np.int64).ravel()
    vals = np.asarray(vals, dtype=np.float32).ravel()
    nnz = len(rows)
    n_pad = -(-max(n, 1) // GRID_ROWS) * GRID_ROWS
    m_pad = -(-max(m, 1) // GRID_ROWS) * GRID_ROWS
    C_src = m_pad // 128
    C_dst = n_pad // 128
    if nnz == 0:
        return None

    h = (cols >> 7).astype(np.int64)
    lo = (cols & 127).astype(np.int32)
    rh = (rows >> 7).astype(np.int64)
    rl = (rows & 127).astype(np.int32)

    counts_h = np.bincount(h, minlength=C_src)
    max_count_h = int(counts_h.max())
    cb_s = C_src // 128
    cap_s = GRID_ROWS // C_src
    Rr = int(-(-n // 128))  # real row chunks: dest rows are rh*K+k, rh < Rr

    tgt_blocks = int(np.ceil(np.sqrt(max(nnz, 1) / 64.0)))
    P_min = -(-max_count_h // 128) + 3
    P = int(min(cap_s, max(P_min, -(-tgt_blocks // cb_s)) + 1))
    if P < P_min:
        return None
    # dest slots per row: enough for ~tgt_blocks dest blocks and <=1/3 load,
    # capped by the banked grid budget
    K = max(-(-tgt_blocks * 128 // Rr), -(-ROUTE_LOAD * nnz // (Rr * 128)), 8)
    K = int(min(K, MAX_BANKS * GRID_ROWS // Rr))

    Hs = P * C_src
    Bs = Hs // 128
    Hd = K * Rr
    Bd = -(-Hd // 128)
    banks = -(-Bd // 128)
    if Bs > 128 or banks > MAX_BANKS:
        return None
    if nnz > 0.7 * Bs * 128 * Bd:
        return None

    # per-row dest slot counter + randomized offset
    order = np.argsort(rows, kind="stable")
    inv = np.empty_like(order); inv[order] = np.arange(nnz)
    sorted_rows = rows[order]
    seg_start = np.r_[0, np.flatnonzero(np.diff(sorted_rows)) + 1]
    seg_counts = np.diff(np.r_[seg_start, nnz])
    cum = (np.arange(nnz) - np.repeat(seg_start, seg_counts))[inv]
    rng = np.random.default_rng(seed)
    off = rng.integers(0, K, n).astype(np.int64)
    in_slot = cum < K
    k = ((cum + off[rows]) % K).astype(np.int32)
    drow = rh * K + k
    ds = (drow & 127).astype(np.int32)
    db = (drow >> 7).astype(np.int32)

    # randomized-rounds routing with dest-slot redraw for stuck entries
    occ1 = np.zeros((Hs, 128), dtype=bool)
    occ2 = np.zeros((Bs * 128, banks * 128), dtype=bool)
    occd = np.zeros((n, K), dtype=bool)
    si = np.flatnonzero(in_slot)
    occd[rows[si], k[si]] = True
    plane = np.full(nnz, -1, dtype=np.int32)
    pending = si
    usable_P = P - 1  # last plane reserved empty: known-zero source for idx3
    for rnd in range(rounds):
        if len(pending) == 0:
            break
        if rnd >= 8:
            kp = rng.integers(0, K, len(pending)).astype(np.int32)
            rp = rows[pending]
            ok = ~occd[rp, kp]
            keyd = rp * np.int64(K) + kp
            ok &= _first_per_key(np.where(ok, keyd, -1 - np.arange(len(kp))))
            moved = pending[ok]
            occd[rows[moved], k[moved]] = False
            occd[rows[moved], kp[ok]] = True
            k[moved] = kp[ok]
            dm = rh[moved] * K + k[moved]
            ds[moved] = (dm & 127).astype(np.int32)
            db[moved] = (dm >> 7).astype(np.int32)
        p = rng.integers(0, usable_P, len(pending)).astype(np.int64)
        srow = p * C_src + h[pending]
        dsp, dbp = ds[pending], db[pending]
        sb = srow >> 7
        cand = ~occ1[srow, dsp]
        cand &= ~occ2[sb * 128 + dsp, dbp]
        key2 = (sb * 128 + dsp) * np.int64(banks * 128) + dbp
        cand &= _first_per_key(np.where(cand, key2, -1 - np.arange(len(p))))
        key1 = srow * 128 + dsp
        cand &= _first_per_key(np.where(cand, key1, -1 - np.arange(len(p))))
        placed = pending[cand]
        plane[placed] = p[cand]
        ps = srow[cand]
        occ1[ps, ds[placed]] = True
        occ2[(ps >> 7) * 128 + ds[placed], db[placed]] = True
        pending = pending[~cand]

    placed_mask = plane >= 0
    pi = np.flatnonzero(placed_mask)
    if len(pi) < 0.5 * nnz:
        return None  # routing collapsed; not an xbar-friendly matrix

    idx_src = np.zeros((Hs, 128), dtype=np.int32)
    val_src = np.zeros((Hs, 128), dtype=np.float32)
    idx2 = np.full((banks, Bs * 128, 128), 127, dtype=np.int32)
    idx3 = np.full((banks * 128 * 128, 128), Bs - 1, dtype=np.int32)

    srow = plane[pi].astype(np.int64) * C_src + h[pi]
    idx_src[srow, ds[pi]] = lo[pi]
    val_src[srow, ds[pi]] = vals[pi]
    sb = (srow >> 7).astype(np.int64)
    ss = (srow & 127).astype(np.int32)
    idx2[db[pi] >> 7, sb * 128 + ds[pi], db[pi] & 127] = ss
    idx3[db[pi].astype(np.int64) * 128 + ds[pi], rl[pi]] = sb.astype(np.int32)

    ti = np.flatnonzero(~placed_mask)
    to = ti[np.argsort(rows[ti], kind="stable")]
    tail_vals = vals[to].astype(np.float32)
    tail_rows = rows[to].astype(np.int32)
    tail_cols = cols[to].astype(np.int32)

    if diag is None:
        diag = np.zeros(n, dtype=np.float64)
        dmask = rows == cols
        np.add.at(diag, rows[dmask], vals[dmask].astype(np.float64))
    diag_pad = np.zeros(n_pad, dtype=np.float32)
    diag_pad[:n] = np.asarray(diag, dtype=np.float32)[:n]
    inv_diag = np.where(diag_pad != 0, 1.0 / np.where(diag_pad == 0, 1.0, diag_pad), 0.0).astype(np.float32)

    return XbarOperator(
        jnp.asarray(idx_src), jnp.asarray(val_src), jnp.asarray(idx2),
        jnp.asarray(idx3), jnp.asarray(tail_vals), jnp.asarray(tail_rows),
        jnp.asarray(tail_cols), jnp.asarray(diag_pad), jnp.asarray(inv_diag),
        shape=(n, m), n_pad=n_pad, m_pad=m_pad, C_src=C_src, C_dst=C_dst,
        Rr=Rr, P=P, K=K, Bs=Bs, banks=banks, nnz=nnz)


def xbar_from_csr(csr, dtype=None):
    """Build from the host CSR wrapper; None when infeasible."""
    r, c, v = csr.to_coo()
    return pack_xbar(r, c, v, csr.shape)
