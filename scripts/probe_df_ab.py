"""A/B the df32 covariance core at one bucket: row-tiled Pallas vs XLA df.

Times a 15-step df32 rollout objective (forward and value_and_grad) with the
(P, N, N) covariance core forced to each implementation, plus a scan of 50
moment-match steps to separate per-call dispatch overhead (~30 ms over the
axon tunnel) from per-step compute. This is the measurement tool behind the
PALLAS dispatch threshold in ops.df_cov_core.

Usage: python scripts/probe_df_ab.py [--points 300] [--reps 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GPMPC_TPU_X64"] = "1"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", type=int, default=300)
    p.add_argument("--horizon", type=int, default=15)
    p.add_argument("--reps", type=int, default=10)
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
    from gpmpc_tpu import ops

    f32, f64 = jnp.float32, jnp.float64
    ns, na, nh = 3, 1, args.horizon
    d = ns + na
    n_points = args.points
    bucket = bucket_size(n_points)
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
    x = np.zeros((bucket, d)); y = np.zeros((bucket, ns)); mask = np.zeros(bucket, bool)
    x[:n_points] = rng.uniform(0, 1, (n_points, d))
    y[:n_points] = rng.normal(0, 0.02, (n_points, ns))
    mask[:n_points] = True
    cache64 = masked_cholesky_factorize(
        params, bounds, jnp.asarray(x, f64), jnp.asarray(y, f64), jnp.asarray(mask))
    dfc = split_cache_df(cache64)

    mu0 = jnp.asarray([0.55, 0.48, 0.52], f32)
    v0 = jnp.eye(ns, dtype=f32) * 1e-6
    actions = jnp.asarray(rng.uniform(0, 1, (nh, na)), f32)

    def timeit(fn, *a):
        out = fn(*a); jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1e3)

    # a 50-step moment-match scan isolates per-step compute from per-call
    # dispatch overhead
    def mm_scan(mu, var):
        def body(carry, _):
            m, v = carry
            iv = jnp.zeros((d, d), f32).at[:ns, :ns].set(v)
            M, S, V = moment_match_df(dfc, jnp.concatenate([m, jnp.asarray([0.5], f32)]), iv)
            return (m + 0.001 * M, v + 0.001 * S), jnp.sum(M)
        (_, _), outs = jax.lax.scan(body, (mu, var), None, length=50)
        return jnp.sum(outs)

    def objective(a):
        from gpmpc_tpu.models.gp import predict_trajectory
        mus, vars_ = predict_trajectory(dfc, a, mu0, v0, 0, False)
        return jnp.sum(mus) + jnp.sum(vars_)

    res = {"n_points": n_points, "bucket": bucket}
    for name, flag in (("pallas", True), ("xla", False)):
        # force dispatch: moment_match_df re-imports ops.df_cov_core at each
        # trace, so rebinding the module attribute pins the implementation
        orig = ops.df_cov_core

        def forced(*a, _flag=flag, **k):
            k.pop("use_pallas", None)
            return orig(*a, use_pallas=_flag, **k)

        ops.df_cov_core = forced
        import gpmpc_tpu.models.gp as gpmod
        try:
            scan_fn = jax.jit(mm_scan)
            res[f"mm50_{name}_ms"] = round(timeit(scan_fn, mu0, v0), 2)
            obj = jax.jit(objective)
            res[f"obj_fwd_{name}_ms"] = round(timeit(obj, actions), 2)
            vag = jax.jit(jax.value_and_grad(objective))
            res[f"obj_vag_{name}_ms"] = round(timeit(vag, actions), 2)
        finally:
            ops.df_cov_core = orig
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
