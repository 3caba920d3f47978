"""Pin down the 30 ms per-call factor: argument/output shapes vs constants."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GPMPC_TPU_X64"] = "1"

import jax
import jax.numpy as jnp
import numpy as np


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
f = jax.jit(lambda v: v + 1.0)
res["add_1d128_ms"] = round(timeit(f, jnp.ones((128,), jnp.float32)), 3)
f2 = jax.jit(lambda v: v + 1.0)
res["add_2d8x128_ms"] = round(timeit(f2, jnp.ones((8, 128), jnp.float32)), 3)
f3 = jax.jit(lambda v: v + 1.0)
res["add_scalar_ms"] = round(timeit(f3, jnp.float32(1.0)), 3)
big = jnp.ones((3, 128, 128), jnp.float32)
f4 = jax.jit(lambda v: v + big.sum())
res["closure_2d_ms"] = round(timeit(f4, jnp.ones((8, 128), jnp.float32)), 3)
f5 = jax.jit(lambda v: (v + 1.0, v * 2.0, v - 1.0, v * v, v / 2.0))
res["add_2d_5outs_ms"] = round(timeit(f5, jnp.ones((8, 128), jnp.float32)), 3)
f6 = jax.jit(lambda a, b, c, d, e: a + b + c + d + e)
args6 = [jnp.ones((8, 128), jnp.float32) * i for i in range(5)]
res["add_2d_5args_ms"] = round(timeit(f6, *args6), 3)
f7 = jax.jit(lambda v: v.sum())
res["scalar_out_ms"] = round(timeit(f7, jnp.ones((8, 128), jnp.float32)), 3)
print(json.dumps(res), flush=True)
