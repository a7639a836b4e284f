"""Device-trace the XBAR matvec: run the chained matvec under the JAX
profiler and report per-kernel device durations (fused kernel, k1/k2,
tail ops).  Usage: python scratch/prof_trace.py [n] [P] [K] [2k|fused]
"""
import glob
import gzip
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from sublinear_tpu.ops import xbar


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    if len(sys.argv) > 3:
        os.environ["SLT_XBAR_P"] = sys.argv[2]
        os.environ["SLT_XBAR_K"] = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "fused"
    A = slt.generate("random-sparse", n, seed=7, density=1e-4)
    op = A.op()
    assert isinstance(op, xbar.XbarOperator)
    if mode == "2k":
        xbar.XbarOperator.fused = property(lambda self: False)
    print(f"P={op.P} K={op.K} Bs={op.Bs} Bd={op.Bd} banks={op.banks} "
          f"tail={op.tail_nnz} fused={op.fused}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(op.m_pad), jnp.float32)

    R = 100

    @jax.jit
    def chain(op, x):
        def body(i, v):
            return op.matvec(v) * (1.0 + 1e-9 * i)
        return jax.lax.fori_loop(0, R, body, x)

    np.asarray(jax.device_get(chain(op, x)))  # compile+warm
    tdir = "/tmp/xbar_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        np.asarray(jax.device_get(chain(op, x)))

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace produced"
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    durs = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        pid = ev.get("pid", 0)
        # device lanes only: skip python/host threads by looking for XLA op names
        if not name or "tid" not in ev:
            continue
        durs.setdefault(name, [0, 0.0])
        durs[name][0] += 1
        durs[name][1] += ev.get("dur", 0)
    rows = sorted(durs.items(), key=lambda kv: -kv[1][1])
    total = sum(v[1] for _, v in rows)
    print(f"top events (sum dur {total/1e3:.1f} ms):")
    for name, (cnt, dur) in rows[:28]:
        print(f"  {dur/R:9.1f} us/iter x  {name[:110]}  (n={cnt})")


if __name__ == "__main__":
    main()
