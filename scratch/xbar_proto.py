"""Prototype: crossbar-routed sparse SpMV for TPU (XBAR-ELL).

Pipeline per matvec (all shapes static):
  x2d (C,128)
  G1: prod[p*C+h, l] = x2d[h, idx_src[p*C+h, l]] * val_src[..]     (pallas, grid P)
  T1: (Bs,128,128).swapaxes(1,2)                                   (XLA)
  G2: g2[row, l] = t1[row, idx2[row, l]]                           (pallas)
  T2: (Bs,128,128).transpose(2,1,0) -> (128,128,Bs)                (XLA)
  G3: g3[row, l] = t2pad[row, idx3[row, l]]                        (pallas)
  y2d = g3[:K*C].reshape(K,C,128).sum(0) (+ COO tail)

Routing invariants (set up by the packer):
  entry (r,c,v): h=c>>7, lo=c&127, rh=r>>7, rl=r&127, slot k<K
  drow = k*C+rh, db=drow>>7, ds=drow&127
  placed at source row srow=p*C+h, lane ds   (<=1 entry per (srow,ds))
  idx_src[srow, ds] = lo ; val_src[srow, ds] = v
  idx2[sb*128+ds, db] = srow&127             (<=1 entry per (sb,ds,db))
  idx3[db*128+ds, rl] = sb
  dead lanes: idx2 -> 127 (subrows srow%128==127 reserved empty),
              idx3 -> Bs-1 (last plane reserved empty)
"""
import time
import numpy as np
import scipy.sparse as sp
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_xbar(rows, cols, vals, n, K=None, P_extra=4, verbose=True):
    t0 = time.perf_counter()
    n_pad = -(-n // 16384) * 16384  # C multiple of 128
    C = n_pad // 128
    nnz = len(rows)
    h = cols >> 7
    lo = (cols & 127).astype(np.int32)
    rh = rows >> 7
    rl = (rows & 127).astype(np.int32)

    # slot assignment k: per-row counter
    order = np.argsort(rows, kind='stable')
    inv = np.empty_like(order); inv[order] = np.arange(nnz)
    sorted_rows = rows[order]
    seg_start = np.r_[0, np.flatnonzero(np.diff(sorted_rows)) + 1]
    counts = np.diff(np.r_[seg_start, nnz])
    cum = np.arange(nnz) - np.repeat(seg_start, counts)
    k = cum[inv].astype(np.int32)

    max_count_h = np.bincount(h, minlength=C).max()
    # capacity: routable entries <= Bs*128*Bd (stage-2 lanes hold one entry
    # per distinct dest block).  Size Bs~Bd~sqrt(nnz/64) for ~0.5 load, then
    # round to integral plane/slot counts (multiples of C/128 rows <-> +1
    # plane/slot).  P also needs per-chunk source capacity, +1 reserved
    # empty plane (known-zero source for dead idx3 lanes).
    cb = C // 128
    cap = 16384 // C
    tgt_blocks = int(np.ceil(np.sqrt(max(nnz, 1) / 64.0)))
    P_min = -(-int(max_count_h) // 128) + P_extra
    P = int(min(cap, max(P_min, -(-tgt_blocks // cb)) + 1))
    # dest slots: aim load nnz/(K*C*128) ~ 0.33; bank db axis if K > cap
    K_load = -(-nnz // (C * 128 // 3))
    K = int(max(-(-tgt_blocks // cb), min(cap, 16), min(K_load, 2 * cap)))

    Hs = P * C
    Bs = Hs // 128
    Hd = K * C
    Bd = Hd // 128
    banks_d = -(-Bd // 128)

    # randomized per-row slot offsets: uniform ds/db bin loading
    rng_off = np.random.default_rng(12345)
    off = rng_off.integers(0, K, n).astype(np.int64)
    in_slot = k < K
    k = (k + off[rows]) % K
    drow = rh.astype(np.int64) * K + k
    ds = (drow & 127).astype(np.int32)
    db = (drow >> 7).astype(np.int32)

    # randomized-rounds placement: each pending entry draws a random plane,
    # conflicts (per-(srow,ds) and per-(sb,ds,db) uniqueness) are resolved
    # keeping one winner per bin; losers redraw.  Converges geometrically at
    # ~0.5 load (balls-into-bins with retry).
    def _first_per_key(keys):
        order = np.argsort(keys, kind='stable')
        ks = keys[order]
        first = np.r_[True, ks[1:] != ks[:-1]]
        out = np.zeros(len(keys), dtype=bool)
        out[order[first]] = True
        return out

    occ1 = np.zeros((Hs, 128), dtype=bool)        # (srow, ds)
    occ2 = np.zeros((Bs * 128, banks_d * 128), dtype=bool)  # (sb*128+ds, db)
    # dest-slot occupancy for k-redraw of stuck entries
    occd = np.zeros((n, K), dtype=bool)
    si = np.flatnonzero(in_slot)
    occd[rows[si], k[si]] = True
    plane = np.full(nnz, -1, dtype=np.int32)
    pending = si
    usable_P = P - 1  # last plane reserved empty (zero source for idx3)
    for rnd in range(80):
        if len(pending) == 0:
            break
        if rnd >= 8:
            # stuck entries redraw their dest slot k (new ds/db bins)
            kp = rng_off.integers(0, K, len(pending)).astype(np.int32)
            rp = rows[pending]
            ok = ~occd[rp, kp]
            keyd = rp.astype(np.int64) * K + kp
            ok &= _first_per_key(np.where(ok, keyd, -1 - np.arange(len(kp))))
            moved = pending[ok]
            occd[rows[moved], k[moved]] = False
            occd[rows[moved], kp[ok]] = True
            k[moved] = kp[ok]
            dm = rh[moved].astype(np.int64) * K + k[moved]
            ds[moved] = (dm & 127).astype(np.int32)
            db[moved] = (dm >> 7).astype(np.int32)
        p = rng_off.integers(0, usable_P, len(pending)).astype(np.int32)
        srow = p.astype(np.int64) * C + h[pending]
        dsp, dbp = ds[pending], db[pending]
        sb = srow >> 7
        cand = ~occ1[srow, dsp]
        cand &= ~occ2[sb * 128 + dsp, dbp]
        key2 = (sb * 128 + dsp) * 128 + dbp
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
    tail_mask = ~placed_mask  # includes k>=K and routing failures
    pi = np.flatnonzero(placed_mask)

    idx_src = np.zeros((Hs, 128), dtype=np.int32)
    val_src = np.zeros((Hs, 128), dtype=np.float32)
    idx2 = np.full((banks_d, Bs * 128, 128), 127, dtype=np.int32)
    idx3 = np.full((banks_d * 128 * 128, 128), Bs - 1, dtype=np.int32)

    srow = plane[pi] * C + h[pi]
    idx_src[srow, ds[pi]] = lo[pi]
    val_src[srow, ds[pi]] = vals[pi]
    sb = srow >> 7
    ss = (srow & 127).astype(np.int32)
    idx2[db[pi] >> 7, sb * 128 + ds[pi], db[pi] & 127] = ss
    idx3[db[pi] * 128 + ds[pi], rl[pi]] = sb

    # COO tail, rows sorted
    ti = np.flatnonzero(tail_mask)
    to = ti[np.argsort(rows[ti], kind='stable')]
    tail = (vals[to].astype(np.float32), rows[to].astype(np.int32),
            cols[to].astype(np.int32))

    if verbose:
        print(f"pack: n={n} nnz={nnz} C={C} P={P} K={K} Hs={Hs} Bs={Bs} "
              f"Hd={Hd} Bd={Bd} banks={banks_d} tail={len(ti)} ({len(ti)/nnz*100:.2f}%) "
              f"setup={time.perf_counter()-t0:.2f}s")
    return dict(n=n, n_pad=n_pad, C=C, P=P, K=K, Hs=Hs, Bs=Bs, Hd=Hd, Bd=Bd,
                banks_d=banks_d, idx_src=idx_src, val_src=val_src, idx2=idx2,
                idx3=idx3, tail=tail)


# ------------- device matvec -------------

def _gather_prod_kernel(x_ref, i_ref, v_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1) * v_ref[:]


def _gather_kernel(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)


def build_matvec(packed):
    C, P, K = packed['C'], packed['P'], packed['K']
    Hs, Bs, Hd = packed['Hs'], packed['Bs'], packed['Hd']
    n_pad = packed['n_pad']
    idx_src = jnp.asarray(packed['idx_src'])
    val_src = jnp.asarray(packed['val_src'])
    idx2 = jnp.asarray(packed['idx2'])
    idx3 = jnp.asarray(packed['idx3'])
    tv, tr, tc = (jnp.asarray(a) for a in packed['tail'])
    has_tail = len(packed['tail'][0]) > 0

    g1 = pl.pallas_call(
        _gather_prod_kernel,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((C, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 128), lambda p: (p, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 128), lambda p: (p, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 128), lambda p: (p, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hs, 128), jnp.float32),
    )

    RB = 1024  # row-block for streaming gathers
    def mk_g(rows_total):
        grid = rows_total // RB if rows_total % RB == 0 else None
        if grid is None:
            return pl.pallas_call(
                _gather_kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows_total, 128), jnp.float32),
            )
        return pl.pallas_call(
            _gather_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_total, 128), jnp.float32),
        )

    banks_d = packed['banks_d']
    g2 = mk_g(Bs * 128)
    g3 = mk_g(banks_d * 128 * 128)

    def matvec(x):
        x2d = x.reshape(C, 128)
        prod = g1(x2d, idx_src, val_src)                       # (Hs,128)
        t1 = prod.reshape(Bs, 128, 128).swapaxes(1, 2).reshape(Bs * 128, 128)
        t2s = []
        for t in range(banks_d):
            o2 = g2(t1, idx2[t])                               # (Bs*128,128)
            t2 = o2.reshape(Bs, 128, 128).transpose(2, 1, 0)   # (128,128,Bs)
            if Bs < 128:
                t2 = jnp.pad(t2, ((0, 0), (0, 0), (0, 128 - Bs)))
            t2s.append(t2.reshape(128 * 128, 128))
        t2_all = jnp.concatenate(t2s, axis=0) if banks_d > 1 else t2s[0]
        o3 = g3(t2_all, idx3)                                  # (banks*16384,128)
        y2d = o3[:Hd].reshape(C, K, 128).sum(axis=1)
        y = y2d.reshape(n_pad)
        if has_tail:
            prod_t = tv * jnp.take(x, tc, axis=0)
            y = y + jax.ops.segment_sum(prod_t, tr, num_segments=n_pad,
                                        indices_are_sorted=True)
        return y
    return matvec


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=10000)
    ap.add_argument('--deg', type=float, default=10.0)
    args = ap.parse_args()
    n = args.n
    rng = np.random.default_rng(0)
    nnz_off = int(n * args.deg)
    r = rng.integers(0, n, nnz_off)
    c = rng.integers(0, n, nnz_off)
    keep = r != c
    r, c = r[keep], c[keep]
    v = rng.uniform(-1, 1, len(r))
    # dedupe
    key = r.astype(np.int64) * n + c
    _, ui = np.unique(key, return_index=True)
    r, c, v = r[ui], c[ui], v[ui].astype(np.float32)
    # add dominant diagonal
    rows = np.r_[r, np.arange(n)]
    cols = np.r_[c, np.arange(n)]
    diag = np.zeros(n, np.float32)
    np.add.at(diag, r, np.abs(v))
    vals = np.r_[v, (diag + 1.0)].astype(np.float32)

    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    packed = pack_xbar(rows.astype(np.int64), cols.astype(np.int64), vals, n)
    mv = jax.jit(build_matvec(packed))

    x = rng.standard_normal(n).astype(np.float32)
    x_pad = np.zeros(packed['n_pad'], np.float32); x_pad[:n] = x
    y = np.asarray(mv(jnp.asarray(x_pad)))[:n]
    y_ref = A @ x
    err = np.abs(y - y_ref).max() / max(1e-30, np.abs(y_ref).max())
    print(f"correctness: rel err {err:.2e}")

    # timing: chain-length differencing with scalar fetch
    def chain(reps):
        @jax.jit
        def f(x0):
            def body(i, xv):
                yv = mv(xv)
                return yv / (jnp.abs(yv).max() + 1.0)
            return jnp.sum(jax.lax.fori_loop(0, reps, body, x0))
        return f
    xj = jnp.asarray(x_pad)
    f2, f66 = chain(2), chain(66)
    float(f2(xj)); float(f66(xj))
    ts2 = []; ts66 = []
    for _ in range(3):
        t0 = time.perf_counter(); float(f2(xj)); ts2.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f66(xj)); ts66.append(time.perf_counter() - t0)
    per = (min(ts66) - min(ts2)) / 64
    print(f"matvec: {per*1e6:.1f} us  ({len(vals)/per/1e9:.2f} Gnnz/s)")


if __name__ == '__main__':
    main()
