"""Phase breakdown of the df32 (trained-GP) planning step on the current
backend, at a given bucket.

Phases timed (steady-state medians over --reps):
  mm_fwd       one fused moment-matching step (forward only)
  obj_fwd      one 15-step rollout objective evaluation (forward only)
  obj_vag      one value_and_grad of the same objective
  plan         the full Planner.plan call (extend + L-BFGS + restarts)

This is the tool for deciding where the next millisecond comes from
(kernel launches vs glue vs compute) — see PERFORMANCE.md section 10.

Usage: python scripts/profile_df32.py [--points 300] [--horizon 15]
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
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from gpmpc_tpu.memory.buffer import bucket_size
    from gpmpc_tpu.models.gp import (
        GPBounds, masked_cholesky_factorize, moment_match_df, moment_match_df_fused,
        params_from_constrained, predict_trajectory, split_cache_df,
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
    # jit both prep stages: eagerly they are hundreds of per-op tunnel
    # round-trips (~26 ms each on this host) — measured minutes of startup
    print(json.dumps({"phase": "factorize"}), flush=True)
    cache64 = jax.jit(masked_cholesky_factorize)(
        params, bounds, jnp.asarray(x, f64), jnp.asarray(y, f64), jnp.asarray(mask))
    dfc = jax.jit(split_cache_df)(cache64)
    jax.block_until_ready(dfc)

    mu = jnp.asarray([0.55, 0.48, 0.52, 0.5], f32)
    var = jnp.zeros((d, d), f32).at[:ns, :ns].set(jnp.eye(ns, dtype=f32) * 1e-4)
    actions = jnp.asarray(rng.uniform(0, 1, (nh, na)), f32)
    mu0 = jnp.asarray([0.55, 0.48, 0.52], f32)
    v0 = jnp.eye(ns, dtype=f32) * 1e-6

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
    print(json.dumps(res), flush=True)

    # one moment-match step through the PRODUCTION dispatch: whole-step
    # fused kernel at buckets <= 128, XLA stage1/mean + row-tiled Pallas cov
    # core at larger buckets (calling moment_match_df_fused directly at
    # bucket > 128 would hit the whole-step kernel's N^2 Mosaic compile)
    from gpmpc_tpu.ops import use_df_pallas

    mm_fn = moment_match_df_fused if use_df_pallas(bucket, ns, d) else moment_match_df
    mm = jax.jit(lambda m, v: mm_fn(dfc, m, v))
    res["mm_fwd_ms"] = round(timeit(mm, mu, var), 3)
    print(json.dumps(res), flush=True)

    def objective(a):
        mus, vars_ = predict_trajectory(dfc, a, mu0, v0, 0, False)
        return jnp.sum(mus) + jnp.sum(vars_)

    obj = jax.jit(objective)
    res["obj_fwd_ms"] = round(timeit(obj, actions), 3)
    print(json.dumps(res), flush=True)
    vag = jax.jit(jax.value_and_grad(objective))
    res["obj_vag_ms"] = round(timeit(vag, actions), 3)
    print(json.dumps(res), flush=True)

    from gpmpc_tpu.controllers.planner import Planner, PlanSpec
    from gpmpc_tpu.mappers.action import ActionMapperSpec
    from gpmpc_tpu.mappers.reward import RewardSpec

    reward_spec = RewardSpec(
        target_state_action_norm=jnp.asarray([1.0, 0.5, 0.5, 0.5], f32),
        weight_matrix_cost=jnp.asarray(np.diag([1.0, 0.1, 0.1, 1e-3]), f32),
        target_state_norm=jnp.asarray([1.0, 0.5, 0.5], f32),
        weight_matrix_cost_terminal=jnp.asarray(np.diag([5.0, 2.0, 2.0]), f32),
        use_constraints=False,
        state_min=jnp.zeros(ns, f32), state_max=jnp.ones(ns, f32),
        area_multiplier=1.0, exploration_factor=1.0, clip_lower_bound_cost_to_0=False,
    )
    action_spec = ActionMapperSpec(False, jnp.asarray([0.3], f32), nh, na)
    spec = PlanSpec(reward_spec, action_spec, False, nh, na, ns, 4, 4, 4, maxfun=4)
    planner = Planner(spec)
    inits = jnp.asarray(rng.uniform(0, 1, (1, nh * na)), f32)
    aprev = jnp.asarray([0.5], f32)

    def plan():
        return planner.plan(x, y, mask, params, bounds, mu0, v0 * 0 + jnp.eye(ns, dtype=f32) * 1e-6,
                            inits, aprev, 0)

    res["plan_ms"] = round(timeit(plan), 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
