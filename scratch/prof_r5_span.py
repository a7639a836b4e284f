"""Device-span timing: trace one jitted chain; device time = span of the
jit_run event on the device track (includes everything, excludes RPC)."""
import glob, gzip, json, os, sys
import numpy as np
import jax

def device_span_ms(fn, *args, tag="span"):
    """Run fn under the profiler; return the duration of the longest single
    event (the outer jit program execution on device) in ms."""
    float(np.asarray(jax.device_get(fn(*args))).ravel()[0])
    tdir = f"/tmp/r5span_{tag}_{os.getpid()}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        float(np.asarray(jax.device_get(fn(*args))).ravel()[0])
    best = 0.0
    with gzip.open(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)[0], "rt") as f:
        tr = json.load(f)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("name", "").startswith("jit_"):
            best = max(best, ev.get("dur", 0))
    os.system(f"rm -rf {tdir}")
    return best / 1e3
