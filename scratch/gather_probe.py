"""Probe Mosaic/Pallas gather support + throughput on the real TPU.

Variants:
  A. in-kernel jnp.take(x_1d, idx_1d)            -- full-table 1D gather
  B. in-kernel jnp.take_along_axis(tbl, idx, -1) -- per-sublane lane gather
  C. in-kernel x_2d[idx] row gather
  D. XLA baseline jnp.take narrow / wide
"""
import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128 * 1024          # table size (131072 floats = 512 KB)
M = 1024 * 1024         # number of gathers

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (N,), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, N, jnp.int32)


def timeit(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return dt, out


# ---- A: full-table 1D gather inside Pallas
def kern_a(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

@jax.jit
def run_a(x, idx):
    return pl.pallas_call(
        kern_a,
        out_shape=jax.ShapeDtypeStruct((M,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)

# ---- B: per-sublane lane gather, small table
def kern_b(tbl_ref, idx_ref, o_ref):
    # tbl (8,128) idx (8,128): out[s,l] = tbl[s, idx[s,l]]
    o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)

@jax.jit
def run_b(tbl, idx8):
    return pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct(idx8.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx8)

# ---- B2: big lane-gather: table (S,128), idx (S,128) gather along lanes
def run_b2(tblS, idxS):
    return pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct(idxS.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tblS, idxS)

# ---- B3: gather along SUBLANES: tbl (S,128), idx (S,128): out[s,l]=tbl[idx[s,l],l]
def kern_b3(tbl_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

def run_b3(tblS, idxS):
    return pl.pallas_call(
        kern_b3,
        out_shape=jax.ShapeDtypeStruct(idxS.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tblS, idxS)

# ---- D: XLA baselines
@jax.jit
def xla_narrow(x, idx):
    return jnp.take(x, idx, axis=0)

results = {}
# A
try:
    dt, out = timeit(run_a, x, idx)
    ref = x[idx]
    ok = bool(jnp.allclose(out, ref))
    results['A_pallas_full_1d'] = (dt / M * 1e9, ok)
except Exception as e:
    results['A_pallas_full_1d'] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"

# B small
tbl = jax.random.normal(key, (8, 128), jnp.float32)
idx8 = jax.random.randint(jax.random.PRNGKey(2), (8, 128), 0, 128, jnp.int32)
try:
    dt, out = timeit(run_b, tbl, idx8)
    ref = jnp.take_along_axis(tbl, idx8, axis=1)
    ok = bool(jnp.allclose(out, ref))
    results['B_lane_gather_8x128'] = (dt / (8*128) * 1e9, ok)
except Exception as e:
    results['B_lane_gather_8x128'] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"

# B2 big
S = M // 128
tblS = jax.random.normal(key, (S, 128), jnp.float32)
idxS = jax.random.randint(jax.random.PRNGKey(3), (S, 128), 0, 128, jnp.int32)
try:
    fb2 = jax.jit(run_b2)
    dt, out = timeit(fb2, tblS, idxS)
    ref = jnp.take_along_axis(tblS, idxS, axis=1)
    ok = bool(jnp.allclose(out, ref))
    results['B2_lane_gather_big'] = (dt / M * 1e9, ok)
except Exception as e:
    results['B2_lane_gather_big'] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"

# B3 sublane gather within 8-tall tiles
tbl8 = jax.random.normal(key, (8, 128), jnp.float32)
idx8s = jax.random.randint(jax.random.PRNGKey(4), (8, 128), 0, 8, jnp.int32)
try:
    fb3 = jax.jit(run_b3)
    dt, out = timeit(fb3, tbl8, idx8s)
    ref = jnp.take_along_axis(tbl8, idx8s, axis=0)
    ok = bool(jnp.allclose(out, ref))
    results['B3_sublane_gather_8x128'] = (dt / (8*128) * 1e9, ok)
except Exception as e:
    results['B3_sublane_gather_8x128'] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"

# B3 big: table (S,128) gather along axis 0 with arbitrary S-range indices
idxS2 = jax.random.randint(jax.random.PRNGKey(5), (S, 128), 0, S, jnp.int32)
try:
    fb3b = jax.jit(run_b3)
    dt, out = timeit(fb3b, tblS, idxS2)
    ref = jnp.take_along_axis(tblS, idxS2, axis=0)
    ok = bool(jnp.allclose(out, ref))
    results['B4_sublane_gather_big'] = (dt / M * 1e9, ok)
except Exception as e:
    results['B4_sublane_gather_big'] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"

# D
dt, _ = timeit(xla_narrow, x, idx)
results['D_xla_narrow'] = (dt / M * 1e9, True)

for k, v in results.items():
    print(k, '->', v)
