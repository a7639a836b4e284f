"""Trace the INTEGRATED chain kernel (ops/xbar.py) per-launch device time."""
import glob, gzip, json, os, sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    iters = 12
    R = 30
    A = slt.generate("random-sparse", n, seed=7, density=d)
    op = A.op()
    print(f"P={op.P} K={op.K} Bs={op.Bs} Bd={op.Bd}")
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.standard_normal(op.m_pad), jnp.float32)

    @jax.jit
    def run(op, t):
        def body(i, v):
            acc, term, r = op.neumann_chain(v * (1.0 + 1e-9 * i), iters,
                                            with_residual=True)
            return acc + 1e-30 * r
        return jax.lax.fori_loop(0, R, body, t)

    float(np.asarray(jax.device_get(run(op, t0)))[0])
    tdir = "/tmp/r5trace_solve"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        float(np.asarray(jax.device_get(run(op, t0)))[0])
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    durs = []
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("name", "").startswith("closed_call"):
            durs.append(ev.get("dur", 0))
    dd = np.array(sorted(durs))
    print(f"launch: min {dd.min():.0f} med {np.median(dd):.0f} us "
          f"-> {np.median(dd)/iters:.1f} us/pass (n={len(dd)})")


if __name__ == "__main__":
    main()
