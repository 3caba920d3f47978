"""Phase-timed probe of the df32 fused kernel at one bucket (default 384)."""
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

from check_df_fused import make_cache

from gpmpc_tpu.models.gp import moment_match_df, moment_match_df_fused

bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 384
n_active = bucket - bucket // 8
dfc = make_cache(n_active, bucket)
ns = 3
f32 = jnp.float32
mu = jnp.asarray([0.55, 0.48, 0.52, 0.5], f32)
sv = jnp.eye(ns, dtype=f32) * 1e-4


def scalar(fn):
    def g(mu_, sv_):
        v = jnp.zeros((4, 4), f32).at[:ns, :ns].set(sv_)
        M, S, V = fn(dfc, mu_, v)
        return jnp.sum(M) + jnp.sum(S * S) + jnp.sum(V)
    return g


def phase(name, thunk):
    t0 = time.perf_counter()
    out = thunk()
    jax.block_until_ready(out)
    print(f"{name}: {time.perf_counter() - t0:.1f}s", flush=True)
    return out


vx = phase("xla fwd", lambda: jax.jit(scalar(moment_match_df))(mu, sv))
gx = phase("xla grad", lambda: jax.jit(jax.grad(scalar(moment_match_df), argnums=(0, 1)))(mu, sv))
vf = phase("fused fwd", lambda: jax.jit(scalar(moment_match_df_fused))(mu, sv))
print("fwd rel err:", abs(float(vf) - float(vx)) / abs(float(vx)), flush=True)
gf = phase("fused grad", lambda: jax.jit(jax.grad(scalar(moment_match_df_fused), argnums=(0, 1)))(mu, sv))
for a, b, nm in [(gf[0], gx[0], "gmu"), (gf[1], gx[1], "gsv")]:
    a, b = np.asarray(a), np.asarray(b)
    print(nm, "rel err:", float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-6))), flush=True)
