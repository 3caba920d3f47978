"""Latency floor probes on the current backend: trivial jit call, one
Pallas no-op-ish kernel, XLA df32 step, fused df32 step. Distinguishes
host->device dispatch round-trip cost from device compute so kernel-level
optimization targets the right thing (see PERFORMANCE.md section 10).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GPMPC_TPU_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *a, reps=20):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


res = {"backend": jax.default_backend()}

x = jnp.ones((8, 128), jnp.float32)
f_id = jax.jit(lambda v: v + 1.0)
res["jit_add_ms"] = round(timeit(f_id, x), 3)

# chain of 200 dependent adds: measures per-XLA-op device overhead
def chain(v):
    for _ in range(200):
        v = v + 1.0
    return v
res["jit_chain200_ms"] = round(timeit(jax.jit(chain), x), 3)

from jax.experimental import pallas as pl

def k(i_ref, o_ref):
    o_ref[...] = i_ref[...] * 2.0

pk = jax.jit(lambda v: pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(v))
res["pallas_noop_ms"] = round(timeit(pk, x), 3)

# 15 sequential pallas launches in one program
def pk15(v):
    for _ in range(15):
        v = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(v)
    return v
res["pallas_15x_ms"] = round(timeit(jax.jit(pk15), x), 3)
print(json.dumps(res), flush=True)

# df32 one step: XLA twin vs fused kernel at bucket 128
from gpmpc_tpu.models.gp import (GPBounds, masked_cholesky_factorize, moment_match_df,
                                 moment_match_df_fused, params_from_constrained, split_cache_df)

f32, f64 = jnp.float32, jnp.float64
ns, d, bucket, n_points = 3, 4, 128, 100
rng = np.random.default_rng(0)
bounds = GPBounds(
    jnp.full((ns, d), 4e-3, f64), jnp.full((ns, d), 10.0, f64),
    jnp.full((ns,), 1e-2, f64), jnp.full((ns,), 0.95, f64),
    jnp.full((ns,), 1e-7, f64), jnp.full((ns,), 1e-4, f64),
)
params = params_from_constrained(
    jnp.full((ns, d), 0.35, f64), jnp.full((ns,), 0.9, f64), jnp.full((ns,), 1e-6, f64), bounds)
xm = np.zeros((bucket, d)); ym = np.zeros((bucket, ns)); mask = np.zeros(bucket, bool)
xm[:n_points] = rng.uniform(0, 1, (n_points, d))
ym[:n_points] = rng.normal(0, 0.02, (n_points, ns))
mask[:n_points] = True
cache64 = masked_cholesky_factorize(params, bounds, jnp.asarray(xm, f64), jnp.asarray(ym, f64), jnp.asarray(mask))
dfc = split_cache_df(cache64)
mu = jnp.asarray([0.55, 0.48, 0.52, 0.5], f32)
var = jnp.zeros((d, d), f32).at[:ns, :ns].set(jnp.eye(ns, dtype=f32) * 1e-4)

res["mm_xla_ms"] = round(timeit(jax.jit(lambda m, v: moment_match_df(dfc, m, v)), mu, var), 3)
print(json.dumps(res), flush=True)
res["mm_fused_ms"] = round(timeit(jax.jit(lambda m, v: moment_match_df_fused(dfc, m, v)), mu, var), 3)
print(json.dumps(res), flush=True)
