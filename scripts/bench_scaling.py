"""Planning-step throughput across memory sizes / horizons.

Demonstrates the scaling behavior of the incremental-factorization planning
path (PERFORMANCE.md §5): at the reference's memory cap (1500 points) a full
per-step refactorization is O(Ns N^3) while the online step here stays
O(Ns N^2 + rollout).

Usage:
  python scripts/bench_scaling.py                      # default sweep
  python scripts/bench_scaling.py --points 300:15 1472:15 --iters 30

Prints one JSON line per (n_points, horizon) configuration.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GPMPC_TPU_X64", "0")


def bench_point(n_points: int, nh: int, iters: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpmpc_tpu.controllers.planner import Planner, PlanSpec
    from gpmpc_tpu.mappers.action import ActionMapperSpec
    from gpmpc_tpu.mappers.reward import RewardSpec
    from gpmpc_tpu.memory.buffer import bucket_size
    from gpmpc_tpu.models.gp import GPBounds, params_from_constrained

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    ns, na = 3, 1
    d = ns + na
    bucket = bucket_size(n_points + iters + 1)
    rng = np.random.default_rng(0)

    reward_spec = RewardSpec(
        target_state_action_norm=jnp.asarray([1.0, 0.5, 0.5, 0.5], dtype=dtype),
        weight_matrix_cost=jnp.asarray(np.diag([1.0, 0.1, 0.1, 1e-3]), dtype=dtype),
        target_state_norm=jnp.asarray([1.0, 0.5, 0.5], dtype=dtype),
        weight_matrix_cost_terminal=jnp.asarray(np.diag([5.0, 2.0, 2.0]), dtype=dtype),
        use_constraints=False,
        state_min=jnp.zeros(ns, dtype=dtype),
        state_max=jnp.ones(ns, dtype=dtype),
        area_multiplier=1.0,
        exploration_factor=1.0,
        clip_lower_bound_cost_to_0=False,
    )
    action_spec = ActionMapperSpec(False, jnp.asarray([0.3], dtype=dtype), nh, na)
    # full reference pendulum optimizer budget incl. maxfun
    # (examples/pendulum/config_pendulum.py)
    spec = PlanSpec(reward_spec, action_spec, False, nh, na, ns, 4, 4, 4, maxfun=4)
    bounds = GPBounds(
        jnp.full((ns, d), 4e-3, dtype=dtype), jnp.full((ns, d), 10.0, dtype=dtype),
        jnp.full((ns,), 1e-2, dtype=dtype), jnp.full((ns,), 0.95, dtype=dtype),
        jnp.full((ns,), 1e-6, dtype=dtype), jnp.full((ns,), 1e-4, dtype=dtype),
    )
    params = params_from_constrained(
        jnp.full((ns, d), 0.5, dtype=dtype), jnp.full((ns,), 5e-2, dtype=dtype),
        jnp.full((ns,), 1e-5, dtype=dtype), bounds,
    )

    x = np.zeros((bucket, d))
    y = np.zeros((bucket, ns))
    mask = np.zeros((bucket,), dtype=bool)
    x[:n_points] = rng.uniform(0, 1, (n_points, d))
    y[:n_points] = rng.normal(0, 0.02, (n_points, ns))
    mask[:n_points] = True
    extra_x = rng.uniform(0, 1, (iters + 1, d))
    extra_y = rng.normal(0, 0.02, (iters + 1, ns))

    state_mu = jnp.asarray(rng.uniform(0, 1, ns), dtype=dtype)
    state_var = jnp.eye(ns, dtype=dtype) * 1e-6
    inits = jnp.asarray(rng.uniform(0, 1, (1, nh * na)), dtype=dtype)
    action_prev = jnp.asarray([0.5], dtype=dtype)

    planner = Planner(spec)

    def step(i):
        n = n_points + i
        x[n], y[n], mask[n] = extra_x[i], extra_y[i], True
        return planner.plan(x, y, mask, params, bounds, state_mu, state_var, inits, action_prev, i)

    import jax as _jax

    out = planner.plan(x, y, mask, params, bounds, state_mu, state_var, inits, action_prev, 0)
    _jax.block_until_ready(out)
    out = step(0)
    _jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = step(i)
    _jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    # per-step blocked latency: block_until_ready after every step — the
    # action latency an MPC controller actually pays (PERFORMANCE.md item
    # 12: pipelined-only loops can measure the tunnel dispatch floor)
    half = max(iters // 2, 1)
    mask[n_points:] = False
    planner.refresh_cache(x, y, mask, params, bounds)
    _jax.block_until_ready(step(0))
    t0 = time.perf_counter()
    for i in range(1, half + 1):
        out = step(i)
        _jax.block_until_ready(out)
    dt_blocked = (time.perf_counter() - t0) / half

    # full-refactorize latency for comparison (what the reference pays per step)
    planner.invalidate_cache()
    t0 = time.perf_counter()
    out = planner.plan(x, y, mask, params, bounds, state_mu, state_var, inits, action_prev, 0)
    _jax.block_until_ready(out)
    dt_full = time.perf_counter() - t0

    return {
        "n_points": n_points,
        "bucket": bucket,
        "horizon": nh,
        "planning_steps_per_sec": round(1.0 / dt, 2),
        "blocked_plan_ms": round(dt_blocked * 1e3, 2),
        "blocked_steps_per_sec": round(1.0 / dt_blocked, 2),
        "full_refactorize_step_s": round(dt_full, 5),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", nargs="*", default=["300:15", "700:15", "1400:15", "300:30"],
                   help="n_points:horizon pairs")
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    for spec_str in args.points:
        n_str, nh_str = spec_str.split(":")
        print(json.dumps(bench_point(int(n_str), int(nh_str), args.iters)), flush=True)


if __name__ == "__main__":
    main()
