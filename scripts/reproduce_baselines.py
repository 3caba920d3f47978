"""Reproduce the five BASELINE.json workloads headless and report cost curves.

Workloads (BASELINE.md / reference examples):
  1. pendulum            — Nh=15, repeat=1 (reference examples/pendulum/)
  2. mountain_car        — Nh=12, repeat=5, restarts=2 (examples/mountain_car/)
  3. process_control     — Nh=5, repeat=5, static params (examples/process_control/)
  4. process_control_constrained — + state constraints + limit_action_change
     (reference README.md:165-195 demo)
  5. process_control_time_varying — include_time_model=True, change_params=True,
     period_change=500 (reference run_processc_control_multiple.py:19,30)

Usage:
  python scripts/reproduce_baselines.py                 # all, full length
  python scripts/reproduce_baselines.py --smoke         # short sanity pass
  python scripts/reproduce_baselines.py --only pendulum --runs 3

Writes one JSON line per workload with the per-step mean cost curve summary
(and the full curves into baselines_out/<name>.json).
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
for sub in ("pendulum", "mountain_car", "process_control"):
    sys.path.insert(0, os.path.join(ROOT, "examples", sub))


def _run_many(make_env, config, num_runs, random_actions_init, num_steps):
    import numpy as np

    from gpmpc_tpu import run_env

    curves = []
    for seed in range(num_runs):
        env = make_env(seed)
        costs = run_env(
            env, config, visu_config=None,
            random_actions_init=random_actions_init, num_steps=num_steps,
            verbose=False, seed=seed,
        )
        curves.append(costs)
    return np.asarray(curves)


def workload_pendulum(args):
    from config_pendulum import get_config

    from gpmpc_tpu.envs import PendulumEnv

    steps = 30 if args.smoke else 150
    return _run_many(lambda s: PendulumEnv(seed=s), get_config(len_horizon=15),
                     args.runs, random_actions_init=10, num_steps=steps)


def workload_mountain_car(args):
    from config_mountaincar import get_config

    from gpmpc_tpu.envs import MountainCarContinuousEnv

    steps = 40 if args.smoke else 500
    return _run_many(lambda s: MountainCarContinuousEnv(seed=s), get_config(num_repeat_actions=5),
                     args.runs, random_actions_init=20, num_steps=steps)


def _pc_env(seed, change_params=False, period_change=500):
    from gpmpc_tpu.envs import ProcessControl

    return ProcessControl(
        dt=1, s_range=(20, 30), fi_range=(0.15, 0.3), ci_range=(0.15, 0.2),
        cr_range=(0.8, 1.0), noise_l_prop_range=(5e-3, 1e-2), noise_co_prop_range=(5e-3, 1e-2),
        sp_l_range=(0.4, 0.6), sp_co_range=(0.4, 0.6),
        change_params=change_params, period_change=period_change, seed=seed,
    )


def workload_process_control(args):
    from config_process_control import get_config

    steps = 60 if args.smoke else 500
    warm = 20 if args.smoke else 100
    cfg = get_config(len_horizon=5, include_time_model=False, num_repeat_actions=5)
    return _run_many(lambda s: _pc_env(s), cfg, args.runs, random_actions_init=warm, num_steps=steps)


class _ObsRecorder:
    """Env proxy that records every observation the controller sees, so
    constraint violations can be COUNTED (VERDICT r2 item 7) instead of
    argued from cost flatness."""

    def __init__(self, env):
        self._env = env
        self.observations = []

    def __getattr__(self, name):
        return getattr(self._env, name)

    def reset(self, *a, **k):
        out = self._env.reset(*a, **k)
        obs = out[0] if isinstance(out, tuple) and len(out) == 2 and isinstance(out[1], dict) else out
        self.observations.append(list(map(float, obs)))
        return out

    def step(self, action):
        out = self._env.step(action)
        self.observations.append(list(map(float, out[0])))
        return out


def workload_mountain_car_constrained(args):
    """The reference's states-constraints demo (README.md:163-183): mountain
    car with CDF penalties keeping the car on the cliff (position capped
    below the top), speed limited, and a left wall. The deliverable is
    constraint satisfaction — "control is reached with few violations" —
    not solving, since the goal position sits above the cap. Reported as a
    countable metric: per-run violation counts of the NORMALIZED state vs
    [state_min, state_max] (warmup steps excluded — random actions are not
    the controller's doing)."""
    import numpy as np

    from config_mountaincar import get_config

    from gpmpc_tpu import run_env
    from gpmpc_tpu.envs import MountainCarContinuousEnv

    steps = 40 if args.smoke else 500
    warm = 20
    cfg = get_config(num_repeat_actions=5)
    cfg.reward.use_constraints = True
    state_min = [0.12, 0.25]   # [position, velocity] normalized
    state_max = [0.90, 0.75]
    cfg.reward.state_min = state_min
    cfg.reward.state_max = state_max
    cfg.reward.area_multiplier = 1.0

    curves, violations = [], []
    for seed in range(args.runs):
        env = _ObsRecorder(MountainCarContinuousEnv(seed=seed))
        costs = run_env(env, cfg, visu_config=None, random_actions_init=warm,
                        num_steps=steps, verbose=False, seed=seed)
        curves.append(costs)
        obs = np.asarray(env.observations)
        lo, hi = np.asarray(env.observation_space.low), np.asarray(env.observation_space.high)
        norm = (obs - lo) / (hi - lo)
        # obs[k] is the state BEFORE action k: controller-attributable states
        # start after the warmup actions have been applied
        post = norm[warm + 1:]
        bad = np.any((post < np.asarray(state_min)) | (post > np.asarray(state_max)), axis=1)
        violations.append(int(bad.sum()))
    extra = {
        "constraint_violations_per_run": violations,
        "constraint_violation_rate": round(float(np.mean(violations)) / max(1, steps - warm), 4),
        "violation_steps_counted": int(steps - warm),
    }
    return np.asarray(curves), extra


def workload_process_control_action_change(args):
    """The reference's action-change-limitation demo (README.md:185-196):
    process control with the derivative action parametrization, no state
    constraints."""
    from config_process_control import get_config

    steps = 60 if args.smoke else 500
    warm = 20 if args.smoke else 100
    cfg = get_config(len_horizon=5, include_time_model=False, num_repeat_actions=5)
    cfg.actions.limit_action_change = True
    # the reference's own tuned limits (its config_process_control.py:36-37)
    cfg.actions.max_change_action_norm = [0.1, 0.2]
    return _run_many(lambda s: _pc_env(s), cfg, args.runs, random_actions_init=warm, num_steps=steps)


def workload_process_control_time_varying(args):
    from config_process_control import get_config

    steps = 80 if args.smoke else 1500
    warm = 20 if args.smoke else 100
    cfg = get_config(len_horizon=5, include_time_model=True, num_repeat_actions=10)
    return _run_many(lambda s: _pc_env(s, change_params=True, period_change=500), cfg,
                     args.runs, random_actions_init=warm, num_steps=steps)


WORKLOADS = {
    "pendulum": workload_pendulum,
    "mountain_car": workload_mountain_car,
    "process_control": workload_process_control,
    "mountain_car_constrained": workload_mountain_car_constrained,
    "process_control_action_change": workload_process_control_action_change,
    "process_control_time_varying": workload_process_control_time_varying,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true", help="short sanity runs")
    p.add_argument("--runs", type=int, default=1)
    p.add_argument("--only", nargs="*", default=None, choices=sorted(WORKLOADS))
    p.add_argument("--out", default=os.path.join(ROOT, "baselines_out"))
    args = p.parse_args()

    import jax
    import numpy as np

    # per-bucket planner graphs recompile identically across seeds — the
    # persistent cache turns a 10-seed sweep from 10x compile into 1x
    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    os.makedirs(args.out, exist_ok=True)
    names = args.only or list(WORKLOADS)
    for name in names:
        out = WORKLOADS[name](args)
        curves, extra = out if isinstance(out, tuple) else (out, {})
        mean = curves.mean(axis=0)
        tail = mean[-max(1, len(mean) // 5):]
        summary = {
            "workload": name,
            "runs": int(curves.shape[0]),
            "steps": int(curves.shape[1]),
            "mean_cost_last_fifth": round(float(tail.mean()), 5),
            "mean_cost_first_fifth": round(float(mean[: max(1, len(mean) // 5)].mean()), 5),
            **extra,
        }
        with open(os.path.join(args.out, f"{name}.json"), "w") as f:
            json.dump({**summary, "mean_curve": mean.tolist()}, f)
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
