"""Trace-based variant comparison: parse per-launch device durations of the
chain kernel from the JAX profiler trace (immune to tunnel RPC noise; clock
drift handled by reporting min/median over many launches + round-robin)."""
import glob, gzip, json, os, sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import sublinear_tpu as slt
from scratch.prof_r5_p2var import make_call, ITERS


def launch_durs(fn, op, t0, tdir):
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        float(np.asarray(jax.device_get(fn(op, t0)))[0, 0])
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    durs = []
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        # the chain pallas kernel is the dominant event; pick by name
        nm = ev.get("name", "")
        if nm.startswith("closed_call"):
            durs.append((nm, ev.get("dur", 0)))
    return durs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else ["base", "p2c", "p2all"]
    R = 30
    A = slt.generate("random-sparse", n, seed=7, density=1e-4)
    op = A.op()
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.standard_normal((op.C_src, 128)), jnp.float32)

    runs = {}
    for v in variants:
        call = make_call(op, v, ITERS)
        @jax.jit
        def run(op_, t, call=call):
            inv2d = op_.inv_diag.reshape(op_.C_src, 128)
            def body(i, vv):
                acc, term = call(vv * (1.0 + 1e-9 * i), inv2d,
                                 op_.idx_src, op_.val_src, op_.idx2, op_.idx3)
                return acc
            return jax.lax.fori_loop(0, R, body, t)
        runs[v] = run
        float(np.asarray(jax.device_get(run(op, t0)))[0, 0])

    # two round-robin passes
    alldurs = {v: [] for v in variants}
    for rr in range(2):
        for v in variants:
            durs = launch_durs(runs[v], op, t0, f"/tmp/r5trace_{v}_{rr}")
            # keep only the dominant (chain) kernel events: dur > 100us
            big = [d for (nm, d) in durs if d > 200]
            allurs = sorted(big)
            alldurs_v = [d / ITERS for d in big]
            allurs = alldurs_v
            allurs and allurs.sort()
            allurs_arr = np.array(allurs)
            if len(allurs_arr):
                print(f"  pass{rr} {v:>6}: n={len(allurs_arr)} min {allurs_arr.min():6.1f} "
                      f"med {np.median(allurs_arr):6.1f} us/iter", flush=True)
                alldurs[v].extend(allurs)
            else:
                names = sorted(set(nm for nm, _ in durs))
                print(f"  pass{rr} {v:>6}: NO big events; names seen: {names[:8]}")
    print()
    for v in variants:
        a = np.array(alldurs[v])
        if len(a):
            print(f"{v:>6}: min {a.min():6.1f}  med {np.median(a):6.1f} us/iter (n={len(a)})")


if __name__ == "__main__":
    main()
