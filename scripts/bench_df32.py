"""Steady-state df32 (trained-GP regime) planning-step latency.

The regime an online-learning episode lives in AFTER the first MLL training
hot-swap: the noise floor is driven toward 1e-6, cond(K + sigma^2 I) ~ 1e6
(PERFORMANCE.md precision boundary), so planning must run the mixed path —
f64 master factorization cache + double-float32 rollout (models/gp.DFCache,
ops/df32.py) — because plain f32 drowns the moment-matching cancellations.
bench.py's headline scenario covers the benign-conditioning f32 path; this
measures the trained-GP steady state (VERDICT r2 item 2).

Usage:
  python scripts/bench_df32.py                    # flagship N=300 (bucket 384)
  python scripts/bench_df32.py --points 128:15 300:15 --iters 30

Prints one JSON line per (n_points, horizon) configuration.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["GPMPC_TPU_X64"] = "1"  # mixed mode: f64 master + df32 rollout


class ColdCacheSkip(RuntimeError):
    """Raised (under --skip-cold) when a heavy program misses the
    persistent compilation cache — aborting within seconds beats burning a
    380-650 s remote-tunnel Mosaic compile inside bench.py's budget
    (VERDICT r4 item 2)."""


_HEAVY_MODULES = ("jit_extend_plan", "jit_plan", "jit_masked_cholesky_factorize")


def _install_skip_cold():
    from jax._src import compiler as _jc

    orig_miss = _jc.log_persistent_cache_miss

    def miss(module_name, cache_key):
        orig_miss(module_name, cache_key)
        if module_name.startswith(_HEAVY_MODULES):
            raise ColdCacheSkip(module_name)

    _jc.log_persistent_cache_miss = miss


def bench_point(n_points: int, nh: int, iters: int, blocked_only: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpmpc_tpu.controllers.planner import Planner, PlanSpec
    from gpmpc_tpu.mappers.action import ActionMapperSpec
    from gpmpc_tpu.mappers.reward import RewardSpec
    from gpmpc_tpu.memory.buffer import bucket_size
    from gpmpc_tpu.models.gp import GPBounds, params_from_constrained

    assert jax.config.jax_enable_x64, "df32 benchmark needs the f64 master"
    f32 = jnp.float32  # compute dtype; the master cache stays f64
    f64 = jnp.float64
    ns, na = 3, 1
    d = ns + na
    n_extra = iters + 1 + max(iters // 2, 1)  # pipelined + blocked loops
    bucket = bucket_size(n_points + n_extra)
    rng = np.random.default_rng(0)

    reward_spec = RewardSpec(
        target_state_action_norm=jnp.asarray([1.0, 0.5, 0.5, 0.5], dtype=f32),
        weight_matrix_cost=jnp.asarray(np.diag([1.0, 0.1, 0.1, 1e-3]), dtype=f32),
        target_state_norm=jnp.asarray([1.0, 0.5, 0.5], dtype=f32),
        weight_matrix_cost_terminal=jnp.asarray(np.diag([5.0, 2.0, 2.0]), dtype=f32),
        use_constraints=False,
        state_min=jnp.zeros(ns, dtype=f32),
        state_max=jnp.ones(ns, dtype=f32),
        area_multiplier=1.0,
        exploration_factor=1.0,
        clip_lower_bound_cost_to_0=False,
    )
    action_spec = ActionMapperSpec(False, jnp.asarray([0.3], dtype=f32), nh, na)
    # reference pendulum optimizer budget incl. maxfun
    # (examples/pendulum/config_pendulum.py: maxiter/maxfun/maxcor/maxls = 4)
    spec = PlanSpec(reward_spec, action_spec, False, nh, na, ns, 4, 4, 4, maxfun=4)
    bounds = GPBounds(
        jnp.full((ns, d), 4e-3, dtype=f64), jnp.full((ns, d), 10.0, dtype=f64),
        jnp.full((ns,), 1e-2, dtype=f64), jnp.full((ns,), 0.95, dtype=f64),
        jnp.full((ns,), 1e-7, dtype=f64), jnp.full((ns,), 1e-4, dtype=f64),
    )
    # training-sharpened hyperparameters: noise floor 1e-6 ->
    # cond(K + sigma^2 I) ~ outputscale/noise ~ 1e6 (the regime where plain
    # f32 breaks and the df32 rollout is required)
    params = params_from_constrained(
        jnp.full((ns, d), 0.35, dtype=f64), jnp.full((ns,), 0.9, dtype=f64),
        jnp.full((ns,), 1e-6, dtype=f64), bounds,
    )

    x = np.zeros((bucket, d))
    y = np.zeros((bucket, ns))
    mask = np.zeros((bucket,), dtype=bool)
    x[:n_points] = rng.uniform(0, 1, (n_points, d))
    y[:n_points] = rng.normal(0, 0.02, (n_points, ns))
    mask[:n_points] = True
    extra_x = rng.uniform(0, 1, (n_extra, d))
    extra_y = rng.normal(0, 0.02, (n_extra, ns))

    state_mu = jnp.asarray(rng.uniform(0, 1, ns), dtype=f32)
    state_var = jnp.eye(ns, dtype=f32) * 1e-6
    inits = jnp.asarray(rng.uniform(0, 1, (1, nh * na)), dtype=f32)
    action_prev = jnp.asarray([0.5], dtype=f32)

    planner = Planner(spec)

    def step(i):
        n = n_points + i
        x[n], y[n], mask[n] = extra_x[i], extra_y[i], True
        return planner.plan(x, y, mask, params, bounds, state_mu, state_var, inits, action_prev, i)

    # warm/compile exactly the two programs the timed loops use (factorize +
    # fused extend+plan); the full-refactorize plan program would double the
    # cold Mosaic compile time for nothing
    t_c0 = time.perf_counter()
    planner.refresh_cache(x, y, mask, params, bounds)
    out = step(0)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t_c0

    dt = None
    if not blocked_only:
        # pipelined: dispatch all iters, block once — amortized device time/step
        t0 = time.perf_counter()
        for i in range(1, iters + 1):
            out = step(i)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters

    # blocked: block_until_ready every step — the true action latency an MPC
    # controller pays before it can step the env (VERDICT r3 item 2).
    # Indices continue consecutively from the last step taken so every
    # timed call stays the fused extend+plan program (appended == 1).
    half = iters if blocked_only else max(iters // 2, 1)
    start = 1 if blocked_only else iters + 1
    t0 = time.perf_counter()
    for i in range(start, start + half):
        out = step(i)
        jax.block_until_ready(out)
    dt_blocked = (time.perf_counter() - t0) / half

    # sanity: the df32 objective must be finite and the actions in-bounds
    a_opt = np.asarray(out[0])
    assert np.all(np.isfinite(a_opt)) and a_opt.min() >= 0 and a_opt.max() <= 1

    return {
        "scenario": "df32_trained_gp",
        "n_points": n_points,
        "bucket": bucket,
        "horizon": nh,
        "planning_steps_per_sec": None if dt is None else round(1.0 / dt, 2),
        "plan_ms": None if dt is None else round(dt * 1e3, 2),
        "blocked_plan_ms": round(dt_blocked * 1e3, 2),
        "blocked_steps_per_sec": round(1.0 / dt_blocked, 2),
        "compile_s": round(compile_s, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--points", nargs="*", default=["300:15"], help="n_points:horizon pairs")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--no-pallas", action="store_true",
                   help="force the XLA df cov core (bounded Mosaic-free "
                        "compile; used by bench.py's time-bounded secondary)")
    p.add_argument("--blocked-only", action="store_true",
                   help="skip the pipelined pass (bench.py secondary: the "
                        "honest df32 frame is per-step-blocked anyway)")
    p.add_argument("--skip-cold", action="store_true",
                   help="abort with rc=3 + a JSON error line if a heavy "
                        "program misses the persistent cache instead of "
                        "paying a 380-650 s tunnel Mosaic compile")
    args = p.parse_args()

    import contextlib

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.skip_cold:
        _install_skip_cold()

    if args.no_pallas:
        from gpmpc_tpu.ops import disable_pallas
        ctx = disable_pallas()
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        for spec_str in args.points:
            n_str, nh_str = spec_str.split(":")
            try:
                rec = bench_point(int(n_str), int(nh_str), args.iters,
                                  blocked_only=args.blocked_only)
            except ColdCacheSkip as e:
                print(json.dumps({"scenario": "df32_trained_gp",
                                  "error": f"cold cache miss on {e}"}), flush=True)
                sys.exit(3)
            rec["pallas"] = not args.no_pallas
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
