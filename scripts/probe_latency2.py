"""Isolate the ~30 ms per-call overhead of df32-touching jitted calls."""
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


res = {}
big = jnp.ones((3, 128, 128), jnp.float32)  # ~200 KB closure constant
x = jnp.ones((128,), jnp.float32)

res["closure_const_ms"] = round(timeit(jax.jit(lambda v: v + big.sum()), x), 3)

from gpmpc_tpu.ops.df32 import df_add, df_exp, df_mul, split_f64

h, l = split_f64(jnp.linspace(0.0, 1.0, 128, dtype=jnp.float64))
res["one_df_add_ms"] = round(timeit(jax.jit(lambda a, b: df_add(a, b, a, b)[0]), h, l), 3)
res["one_df_mul_ms"] = round(timeit(jax.jit(lambda a, b: df_mul(a, b, a, b)[0]), h, l), 3)
res["one_df_exp_ms"] = round(timeit(jax.jit(lambda a, b: df_exp(-a, -b)[0]), h, l), 3)
print(json.dumps(res), flush=True)

# df_exp on (128,128)
H = jnp.broadcast_to(h, (128, 128))
L = jnp.broadcast_to(l, (128, 128))
res["df_exp_2d_ms"] = round(timeit(jax.jit(lambda a, b: df_exp(-a, -b)[0]), H, L), 3)
# chain of 15 df_exp on (128,128)
def chain15(a, b):
    for _ in range(15):
        a, b = df_exp(-a - 1.0, -b)
    return a
res["df_exp_2d_15x_ms"] = round(timeit(jax.jit(chain15), H, L), 3)
print(json.dumps(res), flush=True)
