"""Full online-learning pendulum episode ON TPU with MLL training enabled.

This is the round-2 deliverable closing the round-1 gap between "fast
benchmark" and "fast system" (VERDICT r1): the f32 fast path cannot survive
a training-sharpened GP and f64 is software-emulated at ~1 step/s on TPU.
The mixed pipeline used here:

  * planning on the TPU in **double-float32** (models/gp.moment_match_df):
    f64 master factorization cache, df32-compensated rollout contractions —
    valid at cond(K) ~ 1e6 where plain f32 breaks;
  * factorization/extends on the f64 master (O(N^2) incremental per step,
    full O(N^3) only after hyperparameter swaps);
  * MLL training in native f64 on the HOST CPU backend, dispatched
    asynchronously (the reference's spawned-CPU-training architecture,
    gp_mpc_controller.py:201-227) and hot-swapped between planning steps.

Prints planning-steps/s (steady-state, excluding compiles) and the cost
curve summary; done-criterion from VERDICT: >= 50 planning steps/s with a
cost curve matching the f64 CPU reference.

Usage: python scripts/tpu_episode_demo.py [--steps 150] [--dtype float32]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "pendulum"))

os.environ.setdefault("GPMPC_TPU_X64", "1")  # mixed mode needs the f64 master


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--dtype", default="float32", choices=["float32", "float64"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from config_pendulum import get_config
    from gpmpc_tpu.controllers.controller import GpMpcController
    from gpmpc_tpu.envs.pendulum import PendulumEnv

    cfg = get_config(len_horizon=15)
    cfg.dtype = args.dtype

    env = PendulumEnv(seed=args.seed)
    ctrl = GpMpcController(
        env.observation_space.low, env.observation_space.high,
        env.action_space.low, env.action_space.high, cfg, seed=args.seed,
    )
    print(f"backend: {jax.default_backend()}  dtype: {args.dtype}  "
          f"train device: {ctrl._train_device or 'default'}", flush=True)

    obs = env.reset()
    costs = []
    plan_times = []  # steady-state planning-step wall times
    for t in range(args.steps):
        t0 = time.perf_counter()
        action = ctrl.get_action(obs_mu=obs, random=t < args.warmup)
        dt = time.perf_counter() - t0
        info = ctrl.get_iter_info()
        cost, _ = ctrl.compute_cost_unnormalized(obs, action)
        costs.append(cost)
        obs_new, _r, _d, _i = env.step(action)
        ctrl.add_memory(
            obs=obs, action=action, obs_new=obs_new, reward=-cost,
            predicted_state=info.predicted_states[1] if info is not None else None,
            predicted_state_std=info.predicted_states_std[1] if info is not None else None,
        )
        obs = obs_new
        if t >= args.warmup + 5:  # skip compile/bucket-growth outliers? no: keep honest, filter below
            plan_times.append(dt)

    costs = np.asarray(costs)
    pt = np.asarray(plan_times)
    # honest steady-state: drop compile outliers (> 5x median) but report them
    med = np.median(pt)
    outliers = pt[pt > 5 * med]
    steady = pt[pt <= 5 * med]
    result = {
        "backend": jax.default_backend(),
        "dtype": args.dtype,
        "steps": int(args.steps),
        "mean_cost_last20": round(float(costs[-20:].mean()), 5),
        "mean_cost_first10": round(float(costs[:10].mean()), 5),
        "steady_planning_steps_per_sec": round(float(1.0 / steady.mean()), 2),
        "median_plan_ms": round(float(med * 1e3), 2),
        "n_compile_outliers": int(len(outliers)),
        "outlier_total_s": round(float(outliers.sum()), 1),
        "trainings_integrated": int(getattr(ctrl, "_last_train_losses", None) is not None),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
