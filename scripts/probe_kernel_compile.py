"""Minimal phase-timed compile probe of the fused df32 kernels on chip.

Usage: python scripts/probe_kernel_compile.py [bucket] [fwd|grad]
Prints one line per phase with wall time; isolates which Mosaic compile
stalls or fails (the full check_df_fused also compiles the XLA twin).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GPMPC_TPU_X64"] = "1"

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from check_df_fused import make_cache

from gpmpc_tpu.models.gp import moment_match_df_fused

bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 192
mode = sys.argv[2] if len(sys.argv) > 2 else "fwd"
n_active = bucket - bucket // 8
print(f"bucket={bucket} mode={mode}", flush=True)
t0 = time.perf_counter()
dfc = make_cache(n_active, bucket)
jax.block_until_ready(dfc.x_hi)
print(f"cache: {time.perf_counter() - t0:.1f}s", flush=True)

ns = 3
f32 = jnp.float32
mu = jnp.asarray([0.55, 0.48, 0.52, 0.5], f32)
sv = jnp.eye(ns, dtype=f32) * 1e-4


def scalar(mu_, sv_):
    v = jnp.zeros((4, 4), f32).at[:ns, :ns].set(sv_)
    M, S, V = moment_match_df_fused(dfc, mu_, v)
    return jnp.sum(M) + jnp.sum(S * S) + jnp.sum(V)


t0 = time.perf_counter()
if mode == "fwd":
    out = jax.jit(scalar)(mu, sv)
else:
    out = jax.jit(jax.grad(scalar, argnums=(0, 1)))(mu, sv)
jax.block_until_ready(out)
print(f"{mode}: {time.perf_counter() - t0:.1f}s value={jax.tree_util.tree_leaves(out)[0]}", flush=True)
