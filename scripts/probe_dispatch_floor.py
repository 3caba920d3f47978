"""Is the 26 ms/moment-match a device-compute cost or a per-call floor?

Times the SAME jitted program three ways:
  blocked    block_until_ready after every call (what probe_df_phase saw)
  pipelined  dispatch `reps` calls, block once (amortized device time)
and compares against a control matmul of similar output size.

Usage: python scripts/probe_dispatch_floor.py [--points 300]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GPMPC_TPU_X64"] = "1"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=300)
    p.add_argument("--reps", type=int, default=50)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from gpmpc_tpu.memory.buffer import bucket_size
    from gpmpc_tpu.models.gp import (
        GPBounds, masked_cholesky_factorize, moment_match_df,
        params_from_constrained, split_cache_df,
    )
    from gpmpc_tpu.ops import df_cov_core_xla, override_df_cov_core
    from gpmpc_tpu.ops.pallas_df_cov import df_cov_core_pallas

    f32, f64 = jnp.float32, jnp.float64
    ns, na = 3, 1
    d = ns + na
    n_points = args.points
    bucket = bucket_size(n_points + 2)
    rng = np.random.default_rng(0)

    bounds = GPBounds(
        jnp.full((ns, d), 4e-3, f64), jnp.full((ns, d), 10.0, f64),
        jnp.full((ns,), 1e-2, f64), jnp.full((ns,), 0.95, f64),
        jnp.full((ns,), 1e-7, f64), jnp.full((ns,), 1e-4, f64),
    )
    params = params_from_constrained(
        jnp.full((ns, d), 0.35, f64), jnp.full((ns,), 0.9, f64),
        jnp.full((ns,), 1e-6, f64), bounds,
    )
    x = np.zeros((bucket, d))
    y = np.zeros((bucket, ns))
    mask = np.zeros((bucket,), dtype=bool)
    x[:n_points] = rng.uniform(0, 1, (n_points, d))
    y[:n_points] = rng.normal(0, 0.02, (n_points, ns))
    mask[:n_points] = True
    cache64 = jax.jit(masked_cholesky_factorize, static_argnames=("upcast",))(
        params, bounds, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask), upcast=True)
    dfc = jax.jit(split_cache_df)(cache64)
    jax.block_until_ready(dfc)

    mu_in = jnp.asarray(rng.uniform(0, 1, d), f32)
    var_in = jnp.zeros((d, d), f32).at[:ns, :ns].set(jnp.eye(ns, dtype=f32) * 1e-6)

    def report(name, fn, *a):
        out = fn(*a)  # compile
        jax.block_until_ready(out)
        # blocked
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        blocked = np.median(ts) * 1e3
        # pipelined
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
        jax.block_until_ready(out)
        pipe = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{name}: blocked {blocked:.3f} ms | pipelined {pipe:.3f} ms",
              flush=True)

    def cov_pallas(*a):
        return df_cov_core_pallas(*a[:-1], tuple(int(v) for v in a[-1]))

    def mm(mu_, var_):
        return moment_match_df(dfc, mu_, var_)

    jit_pallas = jax.jit(mm)
    with override_df_cov_core(cov_pallas):
        jax.block_until_ready(jit_pallas(mu_in, var_in))
    jit_xla = jax.jit(lambda m, v: mm(m, v))
    with override_df_cov_core(df_cov_core_xla):
        jax.block_until_ready(jit_xla(mu_in, var_in))

    # control: matmul producing comparable output, plus tiny-output program
    a_big = jnp.asarray(rng.normal(0, 1, (bucket, bucket)), f32)
    mmul = jax.jit(lambda z: (z @ z).sum(axis=0))
    tiny = jax.jit(lambda m: jnp.sin(m) * 2.0)

    report("control_matmul384", mmul, a_big)
    report("control_tiny", tiny, mu_in)
    report("mm_pallas", jit_pallas, mu_in, var_in)
    report("mm_xla", jit_xla, mu_in, var_in)


if __name__ == "__main__":
    main()
