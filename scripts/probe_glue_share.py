"""Split the df32 objective/value_and_grad time into Pallas-cov-core work
vs XLA df32 glue (stage1 + mean path + a/c/U/Xj prep + their VJPs).

Method: time the 15-step objective forward and value_and_grad twice —
once with the production row-tiled Pallas cov core, once with the core
OVERRIDDEN by a free stub (returns zeros of the right shapes/dtypes via
lax.stop_gradient-free math so autodiff still flows through zero) — the
difference attributes the cov core's share; the stubbed time is the glue.

This decides where round 5's optimization effort goes (VERDICT r5 item 1):
if glue dominates, fuse the prep stages into a row-tiled Pallas kernel; if
the cov core dominates, build the residual-emitting single-launch VJP.

Usage: python scripts/probe_glue_share.py [--points 300] [--reps 10]
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

    from gpmpc_tpu import ops
    from gpmpc_tpu.memory.buffer import bucket_size
    from gpmpc_tpu.models.gp import (
        GPBounds, masked_cholesky_factorize, params_from_constrained,
        predict_trajectory, split_cache_df,
    )

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
    cache64 = jax.jit(masked_cholesky_factorize)(
        params, bounds, jnp.asarray(x, f64), jnp.asarray(y, f64), jnp.asarray(mask))
    dfc = jax.jit(split_cache_df)(cache64)
    jax.block_until_ready(dfc)

    actions = jnp.asarray(rng.uniform(0, 1, (nh, na)), f32)
    mu0 = jnp.asarray([0.55, 0.48, 0.52], f32)
    v0 = jnp.eye(ns, dtype=f32) * 1e-6

    def objective(a):
        mus, vars_ = predict_trajectory(dfc, a, mu0, v0, 0, False)
        return jnp.sum(mus) + jnp.sum(vars_)

    def stub_core(ah, al, ch, cl, uh, ul, xjh, xjl, bih, bil, bjh, bjl,
                  ikh, ikl, diag_pos):
        # differentiable free stub: keeps the glue's autodiff structure
        # (gradients flow into a/c/U/Xj) at ~zero cost
        p_ = ah.shape[0]
        ns_ = ikh.shape[0]
        sp = jnp.sum(ah, axis=1) * 0.0 + jnp.sum(ch, axis=1) * 0.0 \
            + jnp.sum(uh, axis=(1, 2)) * 0.0 + jnp.sum(xjh, axis=(1, 2)) * 0.0
        corr = jnp.zeros((ns_,), jnp.float32)
        return sp, jnp.zeros((p_,), jnp.float32), corr, corr

    def timeit(fn, *a):
        out = fn(*a); jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1e3)

    res = {"n_points": n_points, "bucket": bucket, "horizon": nh}

    obj = jax.jit(objective)
    res["obj_fwd_ms"] = round(timeit(obj, actions), 3)
    print(json.dumps(res), flush=True)
    vag = jax.jit(jax.value_and_grad(objective))
    res["obj_vag_ms"] = round(timeit(vag, actions), 3)
    print(json.dumps(res), flush=True)

    with ops.override_df_cov_core(stub_core):
        obj_stub = jax.jit(lambda a: objective(a) + 0.0)
        res["glue_fwd_ms"] = round(timeit(obj_stub, actions), 3)
        print(json.dumps(res), flush=True)
        vag_stub = jax.jit(jax.value_and_grad(lambda a: objective(a) + 0.0))
        res["glue_vag_ms"] = round(timeit(vag_stub, actions), 3)
    res["cov_fwd_ms"] = round(res["obj_fwd_ms"] - res["glue_fwd_ms"], 3)
    res["cov_vag_ms"] = round(res["obj_vag_ms"] - res["glue_vag_ms"], 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
