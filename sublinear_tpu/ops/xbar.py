"""Crossbar-routed sparse SpMV (XBAR) — the TPU large-n single-RHS kernel.

Replaces the reference's unrolled CSR matvec as the hot kernel for large
irregular sparse single-RHS solves (/root/reference/src/ultra_fast.rs:49-97,
/root/reference/src/simd_ops.rs:20-91).  The TPU has no scalar gather loop
worth using: XLA's gather engine costs ~8-16 ns/index, while the native
per-sublane lane gather (``tpu.dynamic_gather``, emitted by
``jnp.take_along_axis(t, i, axis=1)`` inside a Pallas kernel) moves one
element per lane per sublane per cycle (~1024 elem/cycle measured, i.e. a
(128,128) row-aligned gather in ~20 ns).  That primitive only gathers
*within* a 128-lane row, so an arbitrary SpMV is routed through a fixed
crossbar network of lane gathers and in-register 128x128 transposes
(~4 ns/tile measured), fused into TWO Pallas kernels:

  kernel 1 (grid over source blocks sb):
    G1  prod[ss, ds] = x2d[h(ss), idx_src[ss,ds]] * val_src[ss,ds]
    T1  t1[ds, ss]   = prod.T                      (in-VMEM transpose)
    G2  o2[ds, db]   = t1[ds, idx2[ds,db]]         (route to dest block)
    -> o2t[sb, db, ds]  (the only HBM intermediate)
  kernel 2 (grid over dest blocks db, K-slot sum accumulated in VMEM):
    rot m'[sb, dsr]  = o2t[sb, db, (dsr+s_k)&127]  (undo slot rotation)
    T   m'T[dsr, sb]
    G3  o3[dsr, rl]  = m'T[dsr, idx3[dsr,rl]]      (pick source block)
    y[rh, rl] += o3   (K-slot sum is block-local by construction)

Each sparse entry (r, c, v) gets a *route*: a source slot
(plane p, chunk h=c>>7, lane ds) and a per-row dest slot k < K with
  drow = k*Rr_pad + rh,   rh = r>>7,  Rr_pad = Cb_pad*128
  db   = k*Cb_pad + (rh>>7)
  ds   = ((rh & 127) + 37*k) & 127     (rotation keeps lane freedom)
so the K-sum for each output row is confined to statically-known rows of
statically-known dest blocks — kernel 2 accumulates it in VMEM and never
materialises the slot tensor.  Routing is a balls-into-bins problem solved
at pack time (native C++ router in native/packer.cpp with a systematic
second pass, NumPy fallback); failures go to a sorted COO tail handled by
XLA segment_sum (~14 ns/entry on device, so packs aim for tail ZERO: the
diagonal is split out of routing for square matrices and one retry at
K+k_unit attempts a tail-free pack).

Three execution paths, chosen by shape:
  - ``_chain_call``: the WHOLE fixed-iteration Neumann recurrence (plus an
    optional residual pass) as one kernel with all route tables
    VMEM-resident — the solve path (this chip holds >=120 MB of VMEM);
  - ``_fused_call``: one matvec as one kernel, o2t in VMEM scratch;
  - ``_k1_call``/``_k2_call``: the 2-kernel HBM-spill path for shapes whose
    o2t exceeds FUSED_O2T_CAP.

All index tables are int16 (values < 128 by construction; i16 index vregs
gather ~1.5x faster than i8/i32 on this chip and the kernels are
VPU-serial-bound, not HBM-bound — scratch/prof_casts.py, prof_trace.py);
measured single-chip HBM stream bandwidth is ~608 GB/s (scratch/prof_prims.py).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import backend
from . import spmv

import os as _os

GRID_ROWS = 16384         # padding unit for source/dest index spaces
MAX_BANKS = 4             # dest blocks <= MAX_BANKS*128 (idx2 lane budget)
SRC_LOAD = float(_os.environ.get("SLT_XBAR_SRC_LOAD", 0.68))  # source occupancy
# dest-slot occupancy: the native router's systematic second pass (packer.cpp)
# keeps the unroutable tail near zero even at 0.55, and K (hence the phase-2
# dest-block count Bd = K*Cb_pad, the dominant kernel cost) scales with 1/load
DST_LOAD = float(_os.environ.get("SLT_XBAR_DST_LOAD", 0.55))  # dest-slot occupancy
ROT = 37                  # per-slot dest-lane rotation (odd -> all distinct)


def _interpret() -> bool:
    return backend() != "tpu"


def _geometry(n: int, m: int, nnz: int, max_count_h: int,
              p_force: int | None = None, max_class: int = 0):
    """Shared geometry solver for pack + feasibility.  Returns None or a
    dict of the static routing-grid parameters.  ``p_force`` pins the plane
    count (used by pack_xbar's aggressive-P ladder) within structural caps.
    ``max_class`` is the LARGEST (row-chunk, column-window) entry class —
    structured matrices (stencils) concentrate entries into few classes, so
    capacity sizing by the average alone under-provisions P*K and routing
    collapses (round 5: the 2D 5-point Laplacian packed None)."""
    if n <= 0 or m <= 0 or nnz <= 0:
        return None
    m_pad = -(-m // GRID_ROWS) * GRID_ROWS
    n_pad = -(-n // GRID_ROWS) * GRID_ROWS
    C_src = m_pad // 128
    cb_s = C_src // 128
    Rr = -(-n // 128)
    Cb = -(-Rr // 128)
    if Cb <= 8:
        # exact Cb (no pow2 padding): Bd = K*Cb_pad is the phase-2 iteration
        # count, so a Cb=7 matrix keeps 7/8 of the padded dest blocks.  K is
        # rounded to even so phase 2 can pair dest blocks sharing an output
        # row tile (one accumulate per pair).
        Cb_pad = Cb
        k_unit = 2
    else:
        Cb_pad = -(-Cb // 8) * 8
        k_unit = 1
    K_max = (MAX_BANKS * 128 // Cb_pad) // k_unit * k_unit
    P_max = (128 * 128 - 128) // C_src
    if K_max <= 0 or P_max < 2:
        return None
    # lane-coverage rule: reachable dest lanes per row are {(dsr+37k)&127};
    # with few row chunks (small Rr) K must grow so routing keeps lane freedom
    K_cov = -(-384 // min(Rr, 128))
    K = max(8, K_cov, -(-int(nnz / (DST_LOAD * Rr * 128)) // k_unit) * k_unit)
    K = min(-(-K // k_unit) * k_unit, K_max)
    P = max(2, -(-int(max_count_h) // 96) + 1,
            -(-nnz // int(SRC_LOAD * C_src * 128)))
    # routing-class capacity rule: a (sb, ds, db) cell decodes to exactly one
    # row chunk rh, so entries sharing (rh, 128-col h-window) compete for
    # P*K cells; size P (cheap) then K so that class load stays ~0.55
    ew = nnz * 128.0 / (Rr * C_src)          # entries per (rh, h-window)
    need = int(np.ceil(ew / 0.55))
    if P * K < need:
        # balance by measured KERNEL TIME, not table bytes: +1 P adds
        # C_src/128 phase-1 source blocks (~530 ns each), +1 K adds Cb_pad
        # phase-2 dest blocks (~300 ns each) — minimize 530*(C_src/128)*P +
        # 300*Cb_pad*K subject to P*K >= need (scratch/prof_trace.py).
        cost_p = 530.0 * C_src / 128.0
        cost_k = 300.0 * Cb_pad
        K_bal = int(np.sqrt(need * cost_p / cost_k)) + 1
        K = min(max(K, -(-K_bal // k_unit) * k_unit), K_max)
        P = min(max(P, -(-need // K)), P_max)
    if P * K < need:
        k_need = -(-need // P)
        K = min(-(-k_need // k_unit) * k_unit, K_max)
    # hard per-class capacity: entries of ONE (rh, h-window) class compete
    # for exactly P*K cells, so the LARGEST class must fit with slack.
    # ~0.5 class load measured necessary: cells are SHARED across classes
    # (different rh alias onto the same ds for different k), so stencil
    # patterns where EVERY diagonal-window class is full need 2x headroom
    # (5-point Laplacian: tail-free at P*K=544 for max_class=254, 30%
    # tail at P*K=312)
    if max_class:
        need_mx = 2 * int(max_class)
        if P * K < need_mx:
            cost_p = 530.0 * C_src / 128.0
            cost_k = 300.0 * Cb_pad
            K_bal = int(np.sqrt(need_mx * cost_p / cost_k)) + 1
            K = min(max(K, -(-K_bal // k_unit) * k_unit), K_max)
            P = min(max(P, -(-need_mx // K)), P_max)
        if P * K < need_mx:
            return None
    for _ in range(8):
        Hs = P * C_src + 128      # +1 trailing all-zero block (idx3 default)
        Bs = Hs // 128
        # o2t capacity rule: every routed entry occupies one (sb, db, ds)
        # cell of the Bs*Bd*128 intermediate
        K_o2 = -(-int(nnz / 0.5) // (Bs * 128 * Cb_pad))
        K_o2 = -(-K_o2 // k_unit) * k_unit
        if K_o2 <= K:
            break
        if K_o2 <= K_max:
            K = K_o2
            break
        if P >= P_max:
            K = K_max
            break
        P += 1
    # tuning overrides (bench exploration): force P / K within structural caps
    env_p, env_k = _os.environ.get("SLT_XBAR_P"), _os.environ.get("SLT_XBAR_K")
    if p_force is not None:
        P = min(max(2, p_force), P_max)
    if env_p:
        P = min(max(2, int(env_p)), P_max)
    if env_k:
        # round the WHOLE clamped value to a k_unit multiple: max(8, K_cov)
        # can be odd, and an odd K with k_unit=2 breaks the phase-2 pairing
        # invariant (Bd % (2*Cb_pad) != 0) -> silently truncated dest blocks
        K = min(-(-max(8, K_cov, int(env_k)) // k_unit) * k_unit, K_max)
    # round Bs up to a multiple of 8 so phase-1 loops can process 8 source
    # blocks per trip (extra blocks are all-zero)
    Bs = -(-(P * C_src // 128 + 1) // 8) * 8
    Hs = Bs * 128
    Bd = K * Cb_pad
    banks = -(-Bd // 128)
    if Bs > 128:
        return None
    # final feasibility: all three loads must leave routing slack
    if nnz > 0.72 * K * Rr * 128:            # per-row dest slots
        return None
    if nnz > 0.62 * Bs * 128 * Bd:           # o2t cells
        return None
    if ew > 0.75 * P * K:                    # per-(rh, h-window) classes
        return None
    return dict(m_pad=m_pad, n_pad=n_pad, C_src=C_src, cb_s=cb_s, Rr=Rr,
                Cb=Cb, Cb_pad=Cb_pad, K=K, Bd=Bd, banks=banks, P=P, Hs=Hs,
                Bs=Bs, Rr_pad=Cb_pad * 128)


def xbar_feasible(n: int, m: int, nnz: int, max_count_h: int) -> bool:
    """Cheap feasibility probe used by operator selection."""
    return _geometry(n, m, nnz, int(max_count_h)) is not None


def _k1_group(Bs: int) -> int:
    """Source blocks per phase-1 trip.  Round 5 finding: the phases are
    LATENCY-bound, not op-count-bound — Mosaic does not interleave the
    independent per-block dependency chains (gather->mul->transpose->
    gather->store) on its own, so wide trips with op-type staging
    (_staged_phase1) buy ~2x; saturation at ~40-48 staged chains
    (scratch/prof_r5_v3.py: G=8 74.5, G=24 66.2, G=40 64.9, G=120
    64.5 us/iter at n=100k).  The default cap is 24, not 48: staged
    intermediates live on the Mosaic scoped-vmem stack (16 MB hard limit)
    and G=40 at the n=10k geometry blew it through the solver path
    (scratch/prof_r5_oomsweep.py); G=24 costs ~1.7 us/iter at n=100k and
    compiles on every ladder geometry."""
    import os

    env = os.environ.get("SLT_XBAR_G1")
    cap = int(env) if env else 24
    for g in range(min(Bs, cap), 0, -1):
        if Bs % g == 0:
            return g
    return 1


def _staged_phase1(G, banks, Bd, read_x, read_idx, read_vs, read_i2,
                   write_out):
    """One phase-1 trip over G source blocks with SPLIT op staging: all G
    route-gather+mul+transpose chains are issued first, then all bank
    gathers+stores.  The two halves of each block's chain are serially
    dependent; across blocks they are independent — issuing them staged
    lets the VPU overlap latencies (measured ~10 us/iter at n=100k vs the
    per-block serial order; scratch/prof_r5_p1var.py)."""
    t1s = []
    for g in range(G):
        prod = jnp.take_along_axis(read_x(g), read_idx(g), axis=1) * read_vs(g)
        t1s.append(prod.T)                               # (ds, ss)
    for g in range(G):
        for t in range(banks):
            o2b = jnp.take_along_axis(t1s[g], read_i2(g, t), axis=1)
            w = min(128, Bd - t * 128)
            write_out(g, t, o2b.T[:w])


def _k1_call(C_src: int, Bs: int, Bd: int, banks: int, cb_s: int):
    """Fused G1+T1+G2: (x2d, idx_src, val_src, idx2) -> o2t (Bs, Bd, 128).

    G source blocks are processed per grid step so each DMA moves >=256 KB
    (per-step transfer overhead dominated the memory bound at G=1)."""
    bw = banks * 128
    G = _k1_group(Bs)

    def kernel(x_ref, is_ref, vs_ref, i2_ref, o_ref):
        def read_x(g):
            sb = pl.program_id(0) * G + g
            h0 = (sb % cb_s) * 128
            return x_ref[pl.ds(h0, 128), :]

        def write_out(g, t, v):
            o_ref[g, t * 128:t * 128 + v.shape[0], :] = v

        _staged_phase1(
            G, banks, Bd, read_x,
            lambda g: is_ref[g * 128:(g + 1) * 128, :],
            lambda g: vs_ref[g * 128:(g + 1) * 128, :],
            lambda g, t: i2_ref[g * 128:(g + 1) * 128, t * 128:(t + 1) * 128],
            write_out)

    return pl.pallas_call(
        kernel,
        grid=(Bs // G,),
        in_specs=[
            pl.BlockSpec((C_src, 128), lambda sb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 128, 128), lambda sb: (sb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 128, 128), lambda sb: (sb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 128, bw), lambda sb: (sb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Bd, 128), lambda sb: (sb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bs, Bd, 128), jnp.float32),
        interpret=_interpret(),
    )


FUSED_O2T_CAP = 64 * 1024 * 1024  # VMEM-resident o2t budget (v5e holds >=100MB)


def _k2_group(Bd: int, Cb_pad: int) -> int:
    """Dest blocks per phase-2 step: a multiple of 2*Cb_pad (so output-row
    pairs complete within a step) dividing Bd, capped by VMEM block size."""
    u = 2 * Cb_pad
    if Bd % u:
        raise ValueError(
            f"xbar phase-2 pairing invariant violated: Bd={Bd} is not a "
            f"multiple of 2*Cb_pad={u}; a non-divisor group would silently "
            "drop dest blocks")
    g = u
    while g + u <= 32 and Bd % (g + u) == 0:
        g += u
    return g


def _phase2_body(read_slab, i3_slab, y_ref, db0, nblk: int, Cb_pad: int,
                 Bs: int):
    """Staged phase-2 over nblk consecutive dest-block slabs.

    Per slab the chain read->roll->transpose->gather is 4 serially-dependent
    VPU ops; across slabs the chains are independent.  Round 5 measured that
    issuing them op-type-staged (all reads, all rolls, all transposes, all
    gathers, then the y accumulates) cuts phase 2 from ~48 to ~24 us/iter at
    n=100k (scratch/prof_r5_p2var.py: serial 99, 4-chain 85, 14-chain
    74.5 us/iter total) — Mosaic does not create this ILP on its own.

    Dest blocks db = k*Cb_pad + jc; slabs with equal jc = db % Cb_pad share
    an output row tile, so their routed values are summed in registers and
    hit y once.  nblk must be a multiple of Cb_pad (callers use a multiple
    of 2*Cb_pad).  db0 may be traced (fori steps) or static (peeled
    remainder); the roll shift stays a traced-friendly expression.  Callers
    with a major-padded o2t scratch pass Bs=128 and skip the zero-pad concat
    (Mosaic's gather requires a 128-lane source)."""
    ms = [read_slab(ii) for ii in range(nblk)]            # (Bs, 128) each
    mps = []
    for ii, m in enumerate(ms):
        k = (db0 + ii) // Cb_pad
        s_k = (k * ROT) % 128
        # undo the slot rotation; non-negative left-over shift form so a
        # STATIC s_k also passes the mosaic check
        mps.append(pltpu.roll(m, (128 - s_k) % 128, 1))
    mts = [mp.T for mp in mps]                            # (dsr, Bs)
    if Bs < 128:
        pad = jnp.zeros((128, 128 - Bs), jnp.float32)
        mts = [jnp.concatenate([mt, pad], axis=1) for mt in mts]
    o3s = [jnp.take_along_axis(mt, i3_slab(ii), axis=1)   # (dsr, rl)
           for ii, mt in enumerate(mts)]
    for jj in range(Cb_pad):
        acc = None
        for ii in range(jj, nblk, Cb_pad):
            acc = o3s[ii] if acc is None else acc + o3s[ii]
        y_ref[jj * 128:(jj + 1) * 128, :] += acc


def _fused_call(C_src: int, Bs: int, Bd: int, banks: int, cb_s: int,
                Cb_pad: int):
    """BOTH crossbar kernels in ONE pallas_call with the o2t intermediate in
    VMEM scratch — the (write+read) HBM round-trip of o2t was 59% of the
    matvec's HBM traffic and the two separate kernels ran at the SUM of
    their floors (no overlap).  A single sequential grid runs the Bs//G
    source-block steps first (filling the scratch), then the Bd//G2
    dest-block steps (draining it into y); input-block DMAs pipeline across
    the phase boundary for free.  Requires Cb_pad <= 8 and o2t under
    FUSED_O2T_CAP (large-n shapes fall back to the 2-kernel HBM path)."""
    bw = banks * 128
    G = _k1_group(Bs)
    P1 = Bs // G
    G2 = _k2_group(Bd, Cb_pad)
    P2 = Bd // G2
    Ms = 128 if Bs < 128 else Bs   # pad majors: no 128-lane concat in phase 2

    def kernel(x_ref, is_ref, vs_ref, i2_ref, i3_ref, y_ref, o_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
            if Ms > Bs:   # zero the pad majors so phase-2 reads (128,.) slabs
                o_scr[pl.ds(Bs, Ms - Bs), :, :] = jnp.zeros(
                    (Ms - Bs, Bd, 128), jnp.float32)

        @pl.when(i < P1)
        def _():
            def read_x(g):
                sb = i * G + g
                h0 = (sb % cb_s) * 128
                return x_ref[pl.ds(h0, 128), :]

            def write_out(g, t, v):
                sb = i * G + g
                o_scr[pl.ds(sb, 1), pl.ds(t * 128, v.shape[0]), :] = v[None]

            _staged_phase1(
                G, banks, Bd, read_x,
                lambda g: is_ref[g * 128:(g + 1) * 128, :],
                lambda g: vs_ref[g * 128:(g + 1) * 128, :],
                lambda g, t: i2_ref[g * 128:(g + 1) * 128,
                                    t * 128:(t + 1) * 128],
                write_out)

        @pl.when(i >= P1)
        def _():
            j2 = i - P1
            db0v = j2 * G2

            def read_slab(ii):
                return o_scr[:, pl.ds(db0v + ii, 1), :].reshape(Ms, 128)

            _phase2_body(read_slab,
                         lambda ii: i3_ref[ii * 128:(ii + 1) * 128, :],
                         y_ref, db0v, G2, Cb_pad, Ms)

    o2t_bytes = Ms * Bd * 128 * 4
    return pl.pallas_call(
        kernel,
        grid=(P1 + P2,),
        in_specs=[
            pl.BlockSpec((C_src, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 128, 128), lambda i: (jnp.minimum(i, P1 - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 128, 128), lambda i: (jnp.minimum(i, P1 - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * 128, bw), lambda i: (jnp.minimum(i, P1 - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G2 * 128, 128), lambda i: (jnp.maximum(i - P1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Cb_pad * 128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cb_pad * 128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Ms, Bd, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(o2t_bytes + 12 * 1024 * 1024,
                                 100 * 1024 * 1024),
        ),
        interpret=_interpret(),
    )


def _routed_pass(src_scr, y_scr, o_scr, is_ref, vs_ref, i2_ref, i3_ref,
                 G, P1, nb, P2, rem2, banks, Bd, cb_s, Cb_pad, Ms):
    """One full routed matvec pass inside a chain kernel:
    y_scr += R @ src_scr (caller zeroes y_scr beforehand).  Phase trips are
    hardware fori_loops over WIDE staged groups (G source blocks / nb dest
    blocks per trip; round-5 staging results in the _staged_phase1 /
    _phase2_body docstrings)."""
    def p1_body(sg, carry):
        def read_x(g):
            sb = sg * G + g
            h0 = jax.lax.rem(sb, cb_s) * 128
            return src_scr[pl.ds(h0, 128), :]

        def write_out(g, t, v):
            sb = sg * G + g
            o_scr[pl.ds(sb, 1), pl.ds(t * 128, v.shape[0]), :] = v[None]

        _staged_phase1(
            G, banks, Bd, read_x,
            lambda g: is_ref[pl.ds((sg * G + g) * 128, 128), :],
            lambda g: vs_ref[pl.ds((sg * G + g) * 128, 128), :],
            lambda g, t: i2_ref[pl.ds((sg * G + g) * 128, 128),
                                t * 128:(t + 1) * 128],
            write_out)
        return carry

    jax.lax.fori_loop(0, P1, p1_body, 0, unroll=False)

    def p2_block(db0, width):
        def read_slab(ii):
            return o_scr[:, pl.ds(db0 + ii, 1), :].reshape(Ms, 128)

        _phase2_body(read_slab,
                     lambda ii: i3_ref[pl.ds((db0 + ii) * 128, 128), :],
                     y_scr, db0, width, Cb_pad, Ms)

    def p2_body(j2, carry):
        p2_block(j2 * nb, nb)
        return carry

    jax.lax.fori_loop(0, P2, p2_body, 0, unroll=False)
    if rem2:
        p2_block(P2 * nb, rem2)


def _chain_geometry(Bs: int, Bd: int, Cb_pad: int):
    """Shared staging-geometry solver for the chain kernels."""
    G = _k1_group(Bs)
    u2 = 2 * Cb_pad
    nb_cap = int(_os.environ.get("SLT_XBAR_NB", 32))
    nb = max(u2, (nb_cap // u2) * u2)
    nb = min(nb, (Bd // u2) * u2)
    return G, Bs // G, nb, Bd // nb, Bd - (Bd // nb) * nb


def _chain_call(C_src: int, Bs: int, Bd: int, banks: int, cb_s: int,
                Cb_pad: int, iters: int, with_residual: bool = False):
    """FULL Neumann chain in ONE pallas_call:

        term_{j+1} = -inv_d * (R term_j),   acc += term_{j+1}

    where R is the routed off-diagonal operator (requires a tail-free
    diag-split square pack).  Three structural wins vs. per-matvec calls:
      - ALL index tables are whole-array VMEM residents (this chip holds
        >=120 MB of VMEM): the ~25 MB of tables stream from HBM ONCE for
        the whole chain instead of once per iteration, removing the
        ~32 us/iteration phase-1 DMA floor (scratch/prof_fused_ablate.py);
      - term/acc/y carries live in VMEM scratch for the whole chain, so
        iteration state never round-trips HBM;
      - the grid is ONE step per iteration with lax.fori_loops inside
        (nothing is DMA-pipelined, so per-step grid overhead — index-map
        evaluation over 7 operands x 43 steps — is pure waste).
    The reference re-reads the CSR matrix from memory on every iteration
    (/root/reference/src/solver/neumann.rs:154-213); this is the TPU-native
    inversion of that loop.

    with_residual emits the EXACT residual of the penultimate iterate at
    zero extra cost via the Neumann residual identity: with t_0 = D^-1 r_0,
    t_{k+1} = -D^-1 R t_k and x_j = x_0 + sum_{k<=j} t_k,

        A sum_{k<=j} t_k = r_0 + R t_j   =>   r_j = b - A x_j = -R t_j,

    and R t_j IS the y the chain computes on pass j+1 — so pass ``iters-1``
    already holds r_{iters-2}... specifically the last pass's y gives
    res = -R t_{iters-1} = exact residual of x_{iters-1}, a strict upper
    bound (by the contraction factor) on the residual of the RETURNED
    x_iters.  Round 4 spent a full extra matvec pass on this (13 passes for
    a 12-iteration verified solve); the identity makes it free.

    with_residual="norm" emits only ||r||^2 as an SMEM scalar (reduced
    on-chip), skipping the residual VECTOR round-trip and the XLA norm
    fusion in the caller — the verified-solve epilogue becomes one scalar.
    """
    bw = banks * 128
    G, P1, nb, P2, rem2 = _chain_geometry(Bs, Bd, Cb_pad)
    Ms = 128 if Bs < 128 else Bs   # pad majors: no 128-lane concat in phase 2

    def kernel(*refs):
        if with_residual:
            (t0_ref, inv_ref, is_ref, vs_ref, i2_ref, i3_ref, acc_ref,
             tout_ref, res_ref, term_scr, y_scr, o_scr) = refs
        else:
            (t0_ref, inv_ref, is_ref, vs_ref, i2_ref, i3_ref, acc_ref,
             tout_ref, term_scr, y_scr, o_scr) = refs
            res_ref = None
        j = pl.program_id(0)
        norm_only = with_residual == "norm"

        @pl.when(j == 0)
        def _():
            term_scr[:] = t0_ref[:]
            acc_ref[:] = t0_ref[:]
            y_scr[:] = jnp.zeros_like(y_scr)
            if Ms > Bs:
                o_scr[pl.ds(Bs, Ms - Bs), :, :] = jnp.zeros(
                    (Ms - Bs, Bd, 128), jnp.float32)

        _routed_pass(term_scr, y_scr, o_scr, is_ref, vs_ref, i2_ref, i3_ref,
                     G, P1, nb, P2, rem2, banks, Bd, cb_s, Cb_pad, Ms)

        t_new = -(inv_ref[:] * y_scr[:])
        acc_ref[:] = acc_ref[:] + t_new
        term_scr[:] = t_new

        @pl.when(j == iters - 1)
        def _():
            tout_ref[:] = t_new
            if with_residual:
                # Neumann residual identity: y_scr = R t_{iters-1} here, so
                # -y_scr is the EXACT residual of x_{iters-1} (see docstring)
                if norm_only:
                    res_ref[0] = jnp.sum(y_scr[:] * y_scr[:])
                else:
                    res_ref[:] = -y_scr[:]

        y_scr[:] = jnp.zeros_like(y_scr)

    Hs = Bs * 128
    table_bytes = (2 * Hs * 128) + (4 * Hs * 128) + (2 * Hs * bw) \
        + (2 * Bd * 128 * 128)
    o2t_bytes = Ms * Bd * 128 * 4
    vec = lambda: pl.BlockSpec((C_src, 128), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)
    vec_out = lambda: jax.ShapeDtypeStruct((C_src, 128), jnp.float32)
    in_specs = [vec(), vec()]
    in_specs += [
        pl.BlockSpec((Hs, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs, bw), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Bd * 128, 128), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_residual == "norm":
        out_specs = (vec(), vec(),
                     pl.BlockSpec((1,), lambda j: (0,),
                                  memory_space=pltpu.SMEM))
        out_shape = (vec_out(), vec_out(),
                     jax.ShapeDtypeStruct((1,), jnp.float32))
    elif with_residual:
        out_specs = (vec(), vec(), vec())
        out_shape = (vec_out(), vec_out(), vec_out())
    else:
        out_specs = (vec(), vec())
        out_shape = (vec_out(), vec_out())
    return pl.pallas_call(
        kernel,
        grid=(iters,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((C_src, 128), jnp.float32),         # term carry
            pltpu.VMEM((Cb_pad * 128, 128), jnp.float32),  # y accumulator
            pltpu.VMEM((Ms, Bd, 128), jnp.float32),        # o2t
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(table_bytes + o2t_bytes + 16 * 1024 * 1024,
                                 120 * 1024 * 1024),
        ),
        interpret=_interpret(),
    )


def _cg_chain_call(C_src: int, Bs: int, Bd: int, banks: int, cb_s: int,
                   Cb_pad: int, iters: int):
    """``iters`` Jacobi-preconditioned CG iterations as ONE pallas_call —
    the chain-kernel architecture (VMEM-resident tables, scratch-carried
    state) applied to the symmetric workhorse
    (/root/reference/src/optimized_solver.rs:167-350).  Each grid step:

        q = R p + diag*p          (routed pass + diagonal epilogue)
        alpha = rz / (p.q)        (dot reduced on-chip, carried in SMEM)
        x += alpha p; r -= alpha q
        z = D^-1 r; rz' = r.z; beta = rz'/rz; p = z + beta p

    CG state (x, r, p) lives in VMEM scratch for the whole chain; the rz
    scalar carries in SMEM.  The final step emits the full state plus
    ||r||^2 so a chunked driver can check convergence and continue the
    recurrence exactly (same chunking contract as neumann_chain)."""
    bw = banks * 128
    G, P1, nb, P2, rem2 = _chain_geometry(Bs, Bd, Cb_pad)
    Ms = 128 if Bs < 128 else Bs
    TINY = 1e-30

    def kernel(x0_ref, r0_ref, p0_ref, rz0_ref, inv_ref, diag_ref,
               is_ref, vs_ref, i2_ref, i3_ref,
               x_out, r_out, p_out, rz_out, res2_out,
               x_scr, r_scr, p_scr, y_scr, o_scr, rz_smem):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            x_scr[:] = x0_ref[:]
            r_scr[:] = r0_ref[:]
            p_scr[:] = p0_ref[:]
            rz_smem[0] = rz0_ref[0]
            y_scr[:] = jnp.zeros_like(y_scr)
            if Ms > Bs:
                o_scr[pl.ds(Bs, Ms - Bs), :, :] = jnp.zeros(
                    (Ms - Bs, Bd, 128), jnp.float32)

        _routed_pass(p_scr, y_scr, o_scr, is_ref, vs_ref, i2_ref, i3_ref,
                     G, P1, nb, P2, rem2, banks, Bd, cb_s, Cb_pad, Ms)

        p = p_scr[:]
        q = y_scr[:] + diag_ref[:] * p
        rz = rz_smem[0]
        pq = jnp.sum(p * q)
        alpha = rz / jnp.maximum(pq, TINY)
        x = x_scr[:] + alpha * p
        r = r_scr[:] - alpha * q
        z = inv_ref[:] * r
        rz2 = jnp.sum(r * z)
        beta = rz2 / jnp.maximum(rz, TINY)
        x_scr[:] = x
        r_scr[:] = r
        p_scr[:] = z + beta * p
        rz_smem[0] = rz2
        y_scr[:] = jnp.zeros_like(y_scr)

        @pl.when(j == iters - 1)
        def _():
            x_out[:] = x
            r_out[:] = r
            p_out[:] = z + beta * p
            rz_out[0] = rz2
            res2_out[0] = jnp.sum(r * r)

    Hs = Bs * 128
    table_bytes = (2 * Hs * 128) + (4 * Hs * 128) + (2 * Hs * bw) \
        + (2 * Bd * 128 * 128)
    o2t_bytes = Ms * Bd * 128 * 4
    vec = lambda: pl.BlockSpec((C_src, 128), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)
    vec_out = lambda: jax.ShapeDtypeStruct((C_src, 128), jnp.float32)
    smem = lambda: pl.BlockSpec((1,), lambda j: (0,),
                                memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(iters,),
        in_specs=[vec(), vec(), vec(), smem(), vec(), vec(),
                  pl.BlockSpec((Hs, 128), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Hs, 128), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Hs, bw), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Bd * 128, 128), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(vec(), vec(), vec(), smem(), smem()),
        out_shape=(vec_out(), vec_out(), vec_out(),
                   jax.ShapeDtypeStruct((1,), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((C_src, 128), jnp.float32),         # x
            pltpu.VMEM((C_src, 128), jnp.float32),         # r
            pltpu.VMEM((C_src, 128), jnp.float32),         # p
            pltpu.VMEM((Cb_pad * 128, 128), jnp.float32),  # y
            pltpu.VMEM((Ms, Bd, 128), jnp.float32),        # o2t
            pltpu.SMEM((1,), jnp.float32),                 # rz carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(table_bytes + o2t_bytes + 20 * 1024 * 1024,
                                 120 * 1024 * 1024),
        ),
        interpret=_interpret(),
    )


def _k2_call(Bs: int, Bd: int, K: int, Cb_pad: int):
    """Fused rotate+T2+G3+K-sum: (o2t, idx3) -> y2d (Rr_pad, 128)."""
    small = Cb_pad <= 8
    G_rows = min(Cb_pad, 8)          # y rows (in 128-chunks) per out block
    if small:
        # o2t is consumed as a 2D (Bs, Bd*128) view so the per-step block
        # (Bs, G2*128) is lane-tiled for any G2 (a (Bs, G2, 128) 3D block
        # would need G2 % 8 == 0, which exact Cb_pad geometries don't give)
        G2 = _k2_group(Bd, Cb_pad)
        grid = (1, Bd // G2)
        o2t_idx = lambda j8, s: (0, s)
        i3_idx = lambda j8, s: (s, 0)
        out_idx = lambda j8, s: (0, 0)

        def kernel(o_ref, i3_ref, y_ref):
            @pl.when(pl.program_id(1) == 0)
            def _():
                y_ref[:] = jnp.zeros_like(y_ref)
            db0 = G2 * pl.program_id(1)
            _phase2_body(lambda ii: o_ref[:, ii * 128:(ii + 1) * 128],
                         lambda ii: i3_ref[ii * 128:(ii + 1) * 128, :],
                         y_ref, db0, G2, Cb_pad, Bs)
    else:
        G2 = 8
        J8 = Cb_pad // 8
        grid = (J8, K)
        o2t_idx = lambda j8, k: (0, k * J8 + j8, 0)
        i3_idx = lambda j8, k: (k * J8 + j8, 0)
        out_idx = lambda j8, k: (j8, 0)

        def kernel(o_ref, i3_ref, y_ref):
            @pl.when(pl.program_id(1) == 0)
            def _():
                y_ref[:] = jnp.zeros_like(y_ref)
            k = pl.program_id(1)
            s_k = (k * ROT) % 128
            for i in range(G2):
                m = o_ref[:, i, :]                              # (Bs, ds)
                # undo the slot rotation: a lane ROTATE, not a gather
                mp = pltpu.roll(m, -s_k, 1)                     # (Bs, dsr)
                mt = mp.T                                       # (dsr, Bs)
                if Bs < 128:
                    mt = jnp.concatenate(
                        [mt, jnp.zeros((128, 128 - Bs), jnp.float32)], axis=1)
                i3 = i3_ref[i * 128:(i + 1) * 128, :]
                o3 = jnp.take_along_axis(mt, i3, axis=1)        # (dsr, rl)
                y_ref[i * 128:(i + 1) * 128, :] += o3

    o2t_spec = (pl.BlockSpec((Bs, G2 * 128), o2t_idx, memory_space=pltpu.VMEM)
                if small else
                pl.BlockSpec((Bs, G2, 128), o2t_idx, memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            o2t_spec,
            pl.BlockSpec((G2 * 128, 128), i3_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G_rows * 128, 128), out_idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cb_pad * 128, 128), jnp.float32),
        interpret=_interpret(),
    )
    if small:
        return lambda o2t, idx3: call(o2t.reshape(Bs, Bd * 128), idx3)
    return call


@jax.tree_util.register_pytree_node_class
class XbarOperator:
    """Crossbar-routed sparse operator (single-RHS optimized)."""

    def __init__(self, idx_src, val_src, idx2, idx3, tail_vals, tail_rows,
                 tail_cols, diag, inv_diag, *, shape, n_pad, m_pad, C_src,
                 cb_s, Rr, Cb_pad, P, K, Bs, Bd, banks, nnz,
                 diag_split=False):
        self.idx_src = idx_src    # (Hs, 128) i16 — lane lo of gathered col
        self.val_src = val_src    # (Hs, 128) f32
        self.idx2 = idx2          # (Hs, banks*128) i16 — source sublane ss
        self.idx3 = idx3          # (Bd*128, 128) i16 — source block sb
        self.tail_vals = tail_vals
        self.tail_rows = tail_rows
        self.tail_cols = tail_cols
        self.diag = diag          # (n_pad,)
        self.inv_diag = inv_diag  # (n_pad,)
        self.shape = shape
        self.n_pad = n_pad        # row space (dest), multiple of 16384
        self.m_pad = m_pad        # col space (source), multiple of 16384
        self.C_src = C_src
        self.cb_s = cb_s
        self.Rr = Rr              # real row chunks
        self.Cb_pad = Cb_pad      # padded row-chunk blocks (Rr_pad = 128*Cb_pad)
        self.P = P
        self.K = K
        self.Bs = Bs
        self.Bd = Bd
        self.banks = banks
        self._nnz = nnz
        self.diag_split = diag_split  # diagonal excluded from route tables

    # pytree protocol
    def tree_flatten(self):
        children = (self.idx_src, self.val_src, self.idx2, self.idx3,
                    self.tail_vals, self.tail_rows, self.tail_cols,
                    self.diag, self.inv_diag)
        aux = (self.shape, self.n_pad, self.m_pad, self.C_src, self.cb_s,
               self.Rr, self.Cb_pad, self.P, self.K, self.Bs, self.Bd,
               self.banks, self._nnz, self.diag_split)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (shape, n_pad, m_pad, C_src, cb_s, Rr, Cb_pad, P, K, Bs, Bd, banks,
         nnz, diag_split) = aux
        return cls(*children, shape=shape, n_pad=n_pad, m_pad=m_pad,
                   C_src=C_src, cb_s=cb_s, Rr=Rr, Cb_pad=Cb_pad, P=P, K=K,
                   Bs=Bs, Bd=Bd, banks=banks, nnz=nnz, diag_split=diag_split)

    @property
    def dtype(self):
        return self.val_src.dtype

    @property
    def tail_nnz(self) -> int:
        return int(self.tail_vals.shape[0])

    @property
    def nnz(self) -> int:
        return self._nnz

    @property
    def fused(self) -> bool:
        """True when the matvec runs as ONE kernel with o2t in VMEM scratch
        (small/medium shapes); large shapes spill o2t through HBM."""
        return (self.Cb_pad <= 8 and self.Bd % (2 * self.Cb_pad) == 0
                and self.Bs * self.Bd * 128 * 4 <= FUSED_O2T_CAP)

    @property
    def hbm_bytes_per_matvec(self) -> int:
        """Bytes moved per matvec (for roofline accounting)."""
        o2t = 0 if self.fused else self.Bs * self.Bd * 128 * 4
        return (self.idx_src.nbytes + self.idx2.nbytes + self.idx3.nbytes
                + self.val_src.nbytes + 2 * o2t
                + self.m_pad * 4 + self.n_pad * 4 + self.tail_nnz * 12)

    def _routed_matvec(self, x: jax.Array) -> jax.Array:
        """The crossbar product over the ROUTED entries (+COO tail); with
        diag_split this is exactly the off-diagonal product."""
        x2d = x.astype(jnp.float32).reshape(self.C_src, 128)
        if self.fused:
            y2d = _fused_call(self.C_src, self.Bs, self.Bd, self.banks,
                              self.cb_s, self.Cb_pad)(
                x2d, self.idx_src, self.val_src, self.idx2, self.idx3)
        else:
            o2t = _k1_call(self.C_src, self.Bs, self.Bd, self.banks,
                           self.cb_s)(x2d, self.idx_src, self.val_src, self.idx2)
            y2d = _k2_call(self.Bs, self.Bd, self.K, self.Cb_pad)(o2t, self.idx3)
        y = y2d.reshape(-1)[:self.n_pad].astype(x.dtype)
        if self.tail_nnz:
            y = y + spmv.coo_matvec(self.tail_vals.astype(x.dtype),
                                    self.tail_rows, self.tail_cols, x,
                                    self.n_pad)
        return y

    def matvec(self, x: jax.Array) -> jax.Array:
        y = self._routed_matvec(x)
        if self.diag_split:
            y = y + self.diag.astype(x.dtype) * x[: self.n_pad]
        return y

    def matmat(self, X: jax.Array) -> jax.Array:
        """Batched product via scan — the batch path should prefer the ELL
        operator (Matrix.op(batch=True)); this exists for completeness."""
        def step(_, col):
            return None, self.matvec(col)
        _, Y = jax.lax.scan(step, None, X.T)
        return Y.T

    def offdiag_matvec(self, x: jax.Array) -> jax.Array:
        if self.diag_split:
            return self._routed_matvec(x)
        return self.matvec(x) - self.diag * x

    @property
    def chain_ready(self) -> bool:
        """True when the whole Neumann recurrence can run as ONE kernel:
        tail-free diag-split square pack with the o2t scratch in VMEM."""
        return (self.fused and self.diag_split and self.tail_nnz == 0
                and self.shape[0] == self.shape[1]
                and self.n_pad == self.m_pad
                and self.Cb_pad * 16384 == self.n_pad)

    def neumann_chain(self, term0: jax.Array, iters: int,
                      with_residual: bool = False):
        """Runs ``iters`` Neumann iterations as ONE Pallas kernel (see
        _chain_call): returns ``(acc, last_term)`` with
        acc = term0 + sum_{j=1..iters} (-D^-1 R)^j term0 and
        last_term = (-D^-1 R)^iters term0, both m_pad-length.  Seeding with
        the CURRENT term mid-series continues the series: the solver's
        chunked driver uses x' = x + (acc - term), term' = last_term.

        With ``with_residual`` a third output rides along at ZERO extra
        passes (the Neumann residual identity, see _chain_call):
        res = -R t_{iters-1}, the EXACT residual of the penultimate
        iterate — for a solve seeded with term0 = D^-1 b this is
        b - A x_{iters-1}, a strict upper bound (by the contraction
        factor) on the residual of the returned acc = x_iters.
        ``with_residual="norm"`` returns ||res||^2 as a scalar instead
        (reduced on-chip in SMEM; the cheapest verified-solve form)."""
        if not self.chain_ready:
            raise ValueError(
                "neumann_chain requires a chain-ready pack (tail-free, "
                "diag-split, square, fused-capable); this operator has "
                f"tail_nnz={self.tail_nnz}, diag_split={self.diag_split}, "
                f"fused={self.fused} — use the per-matvec solver path")
        t2d = term0.astype(jnp.float32).reshape(self.C_src, 128)
        inv2d = self.inv_diag.reshape(self.C_src, 128)
        if not with_residual:
            acc, term = _chain_call(
                self.C_src, self.Bs, self.Bd, self.banks, self.cb_s,
                self.Cb_pad, int(iters))(
                t2d, inv2d, self.idx_src, self.val_src, self.idx2, self.idx3)
            return (acc.reshape(-1).astype(term0.dtype),
                    term.reshape(-1).astype(term0.dtype))
        acc, term, res = _chain_call(
            self.C_src, self.Bs, self.Bd, self.banks, self.cb_s,
            self.Cb_pad, int(iters), with_residual=with_residual)(
            t2d, inv2d, self.idx_src, self.val_src, self.idx2, self.idx3)
        if with_residual == "norm":
            return (acc.reshape(-1).astype(term0.dtype),
                    term.reshape(-1).astype(term0.dtype),
                    res[0])
        return (acc.reshape(-1).astype(term0.dtype),
                term.reshape(-1).astype(term0.dtype),
                res.reshape(-1).astype(term0.dtype))

    def cg_chain(self, x, r, p, rz, iters: int):
        """Runs ``iters`` Jacobi-PCG iterations as ONE Pallas kernel (see
        _cg_chain_call).  State vectors are m_pad-length; ``rz`` is the
        scalar r.z carry.  Returns (x, r, p, rz, res2) where res2 = ||r||^2
        of the final iterate — seeding the next call with the returned state
        continues the recurrence exactly (chunked driver in solvers/cg.py)."""
        if not self.chain_ready:
            raise ValueError(
                "cg_chain requires a chain-ready pack (tail-free, diag-split,"
                f" square, fused-capable); tail_nnz={self.tail_nnz}, "
                f"diag_split={self.diag_split}, fused={self.fused}")
        shp = (self.C_src, 128)
        dt = x.dtype
        x2, r2, p2 = (v.astype(jnp.float32).reshape(shp) for v in (x, r, p))
        inv2d = self.inv_diag.reshape(shp)
        d2d = self.diag.reshape(shp)
        rz1 = jnp.asarray(rz, jnp.float32).reshape(1)
        xo, ro, po, rzo, res2 = _cg_chain_call(
            self.C_src, self.Bs, self.Bd, self.banks, self.cb_s,
            self.Cb_pad, int(iters))(
            x2, r2, p2, rz1, inv2d, d2d, self.idx_src, self.val_src,
            self.idx2, self.idx3)
        return (xo.reshape(-1).astype(dt), ro.reshape(-1).astype(dt),
                po.reshape(-1).astype(dt), rzo[0], res2[0])

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


def _route_numpy(rows, cols, vals, g, seed: int, rounds: int):
    """Randomized-rounds router (NumPy fallback for native route_xbar).

    Returns (plane, k, placed_mask) arrays over the nnz entries."""
    nnz = len(rows)
    C_src, P, K = g["C_src"], g["P"], g["K"]
    Bs, Bd, Cb_pad = g["Bs"], g["Bd"], g["Cb_pad"]
    Hs = g["Hs"]
    h = (cols >> 7).astype(np.int64)
    rh = (rows >> 7).astype(np.int64)
    dsr = (rh & 127).astype(np.int32)
    jc = (rh >> 7).astype(np.int64)

    # per-row dest slot counter + randomized offset
    order = np.argsort(rows, kind="stable")
    inv = np.empty_like(order); inv[order] = np.arange(nnz)
    sorted_rows = rows[order]
    seg_start = np.r_[0, np.flatnonzero(np.diff(sorted_rows)) + 1]
    seg_counts = np.diff(np.r_[seg_start, nnz])
    cum = (np.arange(nnz) - np.repeat(seg_start, seg_counts))[inv]
    rng = np.random.default_rng(seed)
    n = g["shape_n"]
    off = rng.integers(0, K, n).astype(np.int64)
    in_slot = cum < K
    k = ((cum + off[rows]) % K).astype(np.int32)

    def ds_of(ki, idx):
        return ((dsr[idx] + ki * ROT) & 127).astype(np.int32)

    def db_of(ki, idx):
        return (ki.astype(np.int64) * Cb_pad + jc[idx]).astype(np.int32)

    occ1 = np.zeros((Hs, 128), dtype=bool)
    occ2 = np.zeros((Bs * 128, Bd), dtype=bool)
    occd = np.zeros((n, K), dtype=bool)
    si = np.flatnonzero(in_slot)
    occd[rows[si], k[si]] = True
    plane = np.full(nnz, -1, dtype=np.int32)
    pending = si
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
        p = rng.integers(0, P, len(pending)).astype(np.int64)
        srow = p * C_src + h[pending]
        dsp = ds_of(k[pending], pending)
        dbp = db_of(k[pending], pending)
        sb = srow >> 7
        cand = ~occ1[srow, dsp]
        cand &= ~occ2[sb * 128 + dsp, dbp]
        key2 = (sb * 128 + dsp) * np.int64(Bd) + dbp
        cand &= _first_per_key(np.where(cand, key2, -1 - np.arange(len(p))))
        key1 = srow * 128 + dsp
        cand &= _first_per_key(np.where(cand, key1, -1 - np.arange(len(p))))
        placed = pending[cand]
        plane[placed] = p[cand]
        ps = srow[cand]
        occ1[ps, dsp[cand]] = True
        occ2[(ps >> 7) * 128 + dsp[cand], dbp[cand]] = True
        pending = pending[~cand]

    return plane, k


def _route_tables(rows, cols, vals, n, g, seed, rounds):
    """Route one geometry; returns (tables..., placed mask) or None."""
    C_src, P, K = g["C_src"], g["P"], g["K"]
    Bs, Bd, Cb_pad, Hs = g["Bs"], g["Bd"], g["Cb_pad"], g["Hs"]
    banks = g["banks"]
    from .. import native as _native
    # int16 index planes: the per-sublane lane gather runs ~1.5x faster from
    # i16 index vregs than i8/i32 on this chip (scratch/prof_casts.py), and
    # no i->i32 cast is needed in-kernel.
    idx_src = np.zeros((Hs, 128), dtype=np.int16)
    val_src = np.zeros((Hs, 128), dtype=np.float32)
    idx2 = np.zeros((Hs, banks * 128), dtype=np.int16)
    idx3 = np.full((Bd * 128, 128), Bs - 1, dtype=np.int16)
    placed = None
    if _native.available() and hasattr(_native, "route_xbar"):
        placed = _native.route_xbar(
            rows, cols, vals, n, C_src, P, K, g["Rr"], Cb_pad, Bd, Hs,
            seed, idx_src, val_src, idx2, idx3)
    if placed is None:
        plane, k = _route_numpy(rows, cols, vals, g, seed, rounds)
        placed = plane >= 0
        pi = np.flatnonzero(placed)
        h = (cols[pi] >> 7).astype(np.int64)
        lo = (cols[pi] & 127).astype(np.int16)
        rh = (rows[pi] >> 7).astype(np.int64)
        rl = (rows[pi] & 127).astype(np.int64)
        dsr = (rh & 127).astype(np.int64)
        ds = ((dsr + k[pi] * ROT) & 127).astype(np.int64)
        db = k[pi].astype(np.int64) * Cb_pad + (rh >> 7)
        srow = plane[pi].astype(np.int64) * C_src + h
        idx_src[srow, ds] = lo
        val_src[srow, ds] = vals[pi]
        sb = srow >> 7
        ss = (srow & 127).astype(np.int16)
        idx2[sb * 128 + ds, db] = ss
        idx3[db * 128 + dsr, rl] = sb.astype(np.int16)
    return idx_src, val_src, idx2, idx3, placed


def pack_xbar(rows, cols, vals, shape, diag=None, seed: int = 12345,
              rounds: int = 80):
    """Build an XbarOperator from COO triplets, or return None if the
    routing grids cannot host this matrix (caller falls back to ELL).

    rows/cols: int64 arrays; vals: float array; shape: (n, m).

    For square matrices the diagonal is split OUT of the crossbar: it is
    dense by construction in the DD systems this kernel targets, routing it
    wastes ~n dest slots, and the solver inner loops consume the OFF-diagonal
    product anyway (``offdiag_matvec`` is the raw kernel; ``matvec`` adds
    ``diag*x`` in the epilogue).  When the first route leaves a small
    unroutable tail, one retry at K+k_unit attempts a tail-FREE pack — a
    tail-free operator is what enables the fully-fused iteration chain.
    """
    n, m = shape
    rows = np.asarray(rows, dtype=np.int64).ravel()
    cols = np.asarray(cols, dtype=np.int64).ravel()
    vals = np.asarray(vals, dtype=np.float32).ravel()
    nnz = len(rows)
    if nnz == 0:
        return None

    split_diag = (n == m)
    if diag is None:
        diag = np.zeros(n, dtype=np.float64)
        dmask = rows == cols
        np.add.at(diag, rows[dmask], vals[dmask].astype(np.float64))
    if split_diag:
        off = rows != cols
        rows_r, cols_r, vals_r = rows[off], cols[off], vals[off]
    else:
        rows_r, cols_r, vals_r = rows, cols, vals
    nnz_r = len(rows_r)
    if nnz_r == 0:
        return None

    h_all = (cols_r >> 7).astype(np.int64)
    m_pad_probe = -(-m // GRID_ROWS) * GRID_ROWS
    counts_h = np.bincount(h_all, minlength=m_pad_probe // 128)
    # largest (row-chunk, column-window) class — structured stencils
    # concentrate entries here and need P*K sized to the max, not the mean
    class_id = (rows_r >> 7) * np.int64(m_pad_probe // 128) + h_all
    max_class = int(np.bincount(
        np.unique(class_id, return_inverse=True)[1]).max())
    g = _geometry(n, m, nnz_r, int(counts_h.max()), max_class=max_class)
    if g is None:
        return None
    g["shape_n"] = n
    # aggressive-P ladder: the staged phase-1 cost scales with the source
    # block count Bs ~ P, so try packs at the highest source load the
    # router can still route TAIL-FREE, stepping back toward the default
    # geometry (round 5: n=100k P 16->13 cut the chain kernel 64.5->57.4
    # us/iter).  Ladder packs that leave a tail are discarded.
    # the ladder floor relaxes the default geometry's per-window occupancy
    # headroom (counts/96 + 1) to ~0.875 window load — the systematic
    # second-pass router packs ~0.8 windows tail-free, while pushing to
    # ~0.94 made the first rung an expensive guaranteed-tail route attempt
    P_lo = max(2, -(-int(counts_h.max()) // 112),
               -(-nnz_r // int(0.88 * g["C_src"] * 128)))
    tabs = None
    for p_try in range(max(P_lo, g["P"] - 4), g["P"]):
        g_try = _geometry(n, m, nnz_r, int(counts_h.max()), p_force=p_try,
                          max_class=max_class)
        if (g_try is None or g_try["P"] != p_try
                or g_try["Bs"] >= g["Bs"] or g_try["Bd"] > g["Bd"]):
            continue
        g_try["shape_n"] = n
        tabs_try = _route_tables(rows_r, cols_r, vals_r, n, g_try, seed,
                                 rounds)
        if tabs_try[-1] is not None and tabs_try[-1].all():
            g, tabs = g_try, tabs_try
            break
    if tabs is None:
        tabs = _route_tables(rows_r, cols_r, vals_r, n, g, seed, rounds)
    k_unit = 2 if g["Cb"] <= 8 else 1
    if tabs[-1] is not None and not tabs[-1].all():
        # retry once for a tail-free pack (enables the chained kernel);
        # kept only if it actually empties the tail
        K_max = (MAX_BANKS * 128 // g["Cb_pad"]) // k_unit * k_unit
        if g["K"] + k_unit <= K_max:
            g2 = dict(g)
            g2["K"] = g["K"] + k_unit
            g2["Bd"] = g2["K"] * g2["Cb_pad"]
            g2["banks"] = -(-g2["Bd"] // 128)
            tabs2 = _route_tables(rows_r, cols_r, vals_r, n, g2, seed, rounds)
            if tabs2[-1] is not None and tabs2[-1].all():
                g, tabs = g2, tabs2
    idx_src, val_src, idx2, idx3, placed = tabs
    n_pad, m_pad = g["n_pad"], g["m_pad"]

    if placed.sum() < 0.5 * nnz_r:
        return None  # routing collapsed; not an xbar-friendly matrix

    ti = np.flatnonzero(~placed)
    to = ti[np.argsort(rows_r[ti], kind="stable")]
    tail_vals = vals_r[to].astype(np.float32)
    tail_rows = rows_r[to].astype(np.int32)
    tail_cols = cols_r[to].astype(np.int32)

    diag_pad = np.zeros(n_pad, dtype=np.float32)
    diag_pad[:n] = np.asarray(diag, dtype=np.float32)[:n]
    inv_diag = np.where(diag_pad != 0,
                        1.0 / np.where(diag_pad == 0, 1.0, diag_pad),
                        0.0).astype(np.float32)

    return XbarOperator(
        jnp.asarray(idx_src), jnp.asarray(val_src), jnp.asarray(idx2),
        jnp.asarray(idx3), jnp.asarray(tail_vals), jnp.asarray(tail_rows),
        jnp.asarray(tail_cols), jnp.asarray(diag_pad), jnp.asarray(inv_diag),
        shape=(n, m), n_pad=n_pad, m_pad=m_pad, C_src=g["C_src"],
        cb_s=g["cb_s"], Rr=g["Rr"], Cb_pad=g["Cb_pad"], P=g["P"], K=g["K"],
        Bs=g["Bs"], Bd=g["Bd"], banks=g["banks"], nnz=nnz,
        diag_split=split_diag)


def xbar_from_csr(csr, dtype=None):
    """Build from the host CSR wrapper; None when infeasible."""
    r, c, v = csr.to_coo()
    return pack_xbar(r, c, v, csr.shape)
