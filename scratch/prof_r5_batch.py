"""Trace the batched-Neumann iteration at n=100k x B=128: where does the
time go (gather, einsum materialization, elementwise)?"""
import glob, gzip, json, os, sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from sublinear_tpu.parallel.sharded import _neumann_batch_run

n, B = 100_000, 128
A = slt.generate("random-sparse", n, seed=7, density=1e-4)
op = A.op(batch=True)
print("batch op:", type(op).__name__, "slots:", getattr(op, "slot_count", "?"))
rng = np.random.default_rng(0)
Bm = rng.standard_normal((n, B))
B_pad = np.zeros((op.n_pad, B)); B_pad[:n] = Bm
B_dev = jnp.asarray(B_pad, op.dtype)
thr = 1e-6 * float(np.linalg.norm(Bm, axis=0).max())

@jax.jit
def run(op, Bd):
    X, k, cres = _neumann_batch_run(op, Bd, jnp.zeros_like(Bd), thr * 1.02,
                                    jnp.int32(200))
    return X[0, 0] + jnp.max(cres) * 0.0, k

out = run(op, B_dev); float(np.asarray(jax.device_get(out[0])))
print("iters:", int(jax.device_get(out[1])))
tdir = "/tmp/r5trace_batch"; os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    float(np.asarray(jax.device_get(run(op, B_dev)[0])))
durs = {}
with gzip.open(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)[0], "rt") as f:
    tr = json.load(f)
for ev in tr.get("traceEvents", []):
    if ev.get("ph") != "X":
        continue
    nm = ev.get("name", "")
    if "." in nm and not nm.startswith("$") and "py" not in nm:
        d = durs.setdefault(nm[:70], [0, 0.0])
        d[0] += 1; d[1] += ev.get("dur", 0)
rows = sorted(durs.items(), key=lambda kv: -kv[1][1])[:14]
tot = sum(v[1] for _, v in durs.items())
print(f"total device {tot/1e3:.1f} ms")
for nm, (cnt, dur) in rows:
    print(f"  {dur/1e3:8.2f} ms  n={cnt:>4}  {nm}")
