"""Benchmark: MPC planning-step latency on the BASELINE.json flagship config.

Pendulum-shaped problem — horizon 15, 300+ stored GP points (padded to the
384 bucket), Ns=3, Na=1, reference pendulum optimizer budget (L-BFGS-B
maxiter/maxcor/maxls=4, 1 restart; examples/pendulum/config_pendulum.py:80-84).
One planning step = what the online controller does each control iteration:
append the newly stored transition to the factorization (O(N^2) incremental
Cholesky/inverse extension), then the full moment-matched rollout under
box-L-BFGS with autodiff — one small extend call plus one fused plan call.

Prints TWO JSON lines (the headline LAST, so line-oriented parsers keep it):
  {"metric": "df32_trained_gp_planning_steps_per_sec", "value": N, ...}
  {"metric": "planning_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N/100}
vs_baseline is relative to the BASELINE.json north-star target of 100
planning steps/s on one v5e chip (the reference publishes no wall-clock
numbers at all — README.md:288-292 explicitly disclaims latency).

The second line measures the TRAINED-GP steady state (noise floor ~1e-6,
cond(K) ~ 1e6 — the regime an online-learning episode enters after the
first MLL hot-swap): f64 master factorization + double-float32 rollout
(scripts/bench_df32.py, run as a subprocess because it needs x64 enabled
for the master cache while the headline scenario runs pure f32).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def main():
    # fast-math mode for the benchmark: f32 unless overridden. The f64 path
    # is for parity; the perf story is f32 (TPU MXU native).
    os.environ.setdefault("GPMPC_TPU_X64", "0")

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gpmpc_tpu.controllers.planner import Planner, PlanSpec
    from gpmpc_tpu.mappers.action import ActionMapperSpec
    from gpmpc_tpu.mappers.reward import RewardSpec
    from gpmpc_tpu.models.gp import GPBounds, params_from_constrained

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    ns, na, nh = 3, 1, 15
    n_points, bucket = 300, 384
    d = ns + na
    restarts = 1
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
    action_spec = ActionMapperSpec(
        limit_action_change=False, max_change_action_norm=jnp.asarray([0.3], dtype=dtype), len_horizon=nh, dim_action=na
    )
    spec = PlanSpec(
        reward=reward_spec, action=action_spec, include_time_model=False,
        len_horizon=nh, dim_action=na, dim_state=ns, maxiter=4, maxcor=4, maxls=4,
        # match the full reference pendulum budget incl. the total-eval cap
        # (examples/pendulum/config_pendulum.py: maxfun=4)
        maxfun=4,
    )
    bounds = GPBounds(
        min_lengthscale=jnp.full((ns, d), 4e-3, dtype=dtype),
        max_lengthscale=jnp.full((ns, d), 10.0, dtype=dtype),
        min_outputscale=jnp.full((ns,), 1e-2, dtype=dtype),
        max_outputscale=jnp.full((ns,), 0.95, dtype=dtype),
        min_noise=jnp.full((ns,), 1e-6, dtype=dtype),
        max_noise=jnp.full((ns,), 1e-4, dtype=dtype),
    )
    params = params_from_constrained(
        jnp.full((ns, d), 0.5, dtype=dtype), jnp.full((ns,), 5e-2, dtype=dtype), jnp.full((ns,), 1e-5, dtype=dtype), bounds
    )

    # synthetic pendulum-like memory, padded to the bucket
    x = np.zeros((bucket, d))
    y = np.zeros((bucket, ns))
    mask = np.zeros((bucket,), dtype=bool)
    x[:n_points] = rng.uniform(0, 1, (n_points, d))
    y[:n_points] = rng.normal(0, 0.02, (n_points, ns))
    mask[:n_points] = True

    state_mu = jnp.asarray(rng.uniform(0, 1, ns), dtype=dtype)
    state_var = jnp.eye(ns, dtype=dtype) * 1e-6
    inits = jnp.asarray(rng.uniform(0, 1, (restarts, nh * na)), dtype=dtype)
    action_prev = jnp.asarray([0.5], dtype=dtype)

    # The production planning step: one new stored transition per step ->
    # O(N^2) incremental factorization extension + the jitted cached plan
    # (controllers/planner.py Planner). The reference refactorizes from
    # scratch every planning step; full-refactorize steps here happen only
    # when hyperparameters are retrained (every training_frequency steps).
    planner = Planner(spec)
    iters = 50
    extra_x = rng.uniform(0, 1, (iters + 1, d))
    extra_y = rng.normal(0, 0.02, (iters + 1, ns))

    def step(i):
        n = n_points + i
        x[n] = extra_x[i]
        y[n] = extra_y[i]
        mask[n] = True
        return planner.plan(x, y, mask, params, bounds, state_mu, state_var, inits, action_prev, i)

    # warmup/compile both the factorize and extend+plan programs
    out = planner.plan(x, y, mask, params, bounds, state_mu, state_var, inits, action_prev, 0)
    jax.block_until_ready(out)
    out = step(0)
    jax.block_until_ready(out)

    # steady-state timing
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        out = step(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    steps_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "planning_steps_per_sec",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / 100.0, 3),
            }
        ),
        flush=True,
    )


def df32_scenario():
    """Trained-GP (df32) steady state at the flagship shape, via subprocess
    (needs jax_enable_x64 for the f64 master; the headline runs pure f32)."""
    root = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, GPMPC_TPU_X64="1")
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(root, "scripts", "bench_df32.py"),
             "--points", "300:15", "--iters", "30"],
            env=env, capture_output=True, text=True, timeout=3600, cwd=root,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        res = json.loads(line)
        v = res["planning_steps_per_sec"]
        print(
            json.dumps(
                {
                    "metric": "df32_trained_gp_planning_steps_per_sec",
                    "value": v,
                    "unit": "steps/s",
                    "vs_baseline": round(v / 100.0, 3),
                }
            ),
            flush=True,
        )
    except Exception as e:  # never break the headline metric
        print(json.dumps({
            "metric": "df32_trained_gp_planning_steps_per_sec",
            "value": None, "unit": "steps/s", "vs_baseline": None,
            "error": str(e)[:200],
        }), flush=True)


if __name__ == "__main__":
    # df32 scenario first (subprocess, before this process grabs the TPU);
    # the HEADLINE metric prints LAST so line-oriented parsers keep it.
    df32_scenario()
    main()
