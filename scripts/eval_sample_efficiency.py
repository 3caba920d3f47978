"""Multi-seed sample-efficiency evaluation via the fused on-device episodes.

The reference's headline claims are cost-vs-interaction curves averaged over
10-20 serial host runs (reference run_env_function.py:52-72; README.md:99-133
"Pendulum solved in < 100 interactions"). Here the WHOLE evaluation — every
episode's warmup, planning, memory, and training — is one vmapped XLA
program (runner/jit_episode.py), so a 10-seed sweep costs about one
episode of wall-clock on a TPU.

Usage:
  python scripts/eval_sample_efficiency.py                    # pendulum, 10 seeds
  python scripts/eval_sample_efficiency.py --env mountain_car --seeds 5

Prints one JSON line with the mean cost curve summary and the
interactions-to-solve metric (first step after which the running mean cost
over a 20-step window stays below the threshold).
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "pendulum"))
sys.path.insert(0, os.path.join(ROOT, "examples", "mountain_car"))
os.environ.setdefault("GPMPC_TPU_X64", "0")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="pendulum",
                   choices=["pendulum", "mountain_car", "process_control"])
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--threshold", type=float, default=None)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64", "mixed"],
                   help="float64 (parity; needs GPMPC_TPU_X64=1) solves reliably; "
                        "float32 degrades once training sharpens the GP (see "
                        "PERFORMANCE.md); mixed = f64 master factorization + "
                        "df32 rollout (the TPU production regime; needs "
                        "GPMPC_TPU_X64=1)")
    p.add_argument("--no-pallas", action="store_true",
                   help="trace with Pallas dispatch disabled (XLA fallbacks)")
    p.add_argument("--steps-per-call", type=int, default=None,
                   help="bound each device dispatch to this many episode "
                        "steps (host-stitched segments; carry stays on "
                        "device) — long single dispatches can trip remote-"
                        "runtime execution limits")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpmpc_tpu.envs.jax_dynamics import (
        mountain_car_spec,
        pendulum_spec,
        process_control_spec,
    )
    from gpmpc_tpu.runner import build_episodes_batch_fn, episode_spec_from_config

    fdt = jnp.float64 if args.dtype == "float64" else jnp.float32
    if args.env == "pendulum":
        from config_pendulum import get_config

        cfg = get_config(len_horizon=15)
        env = pendulum_spec(dtype=fdt)
        steps = args.steps or 150
        warmup = 10
        threshold = args.threshold if args.threshold is not None else 0.05
    elif args.env == "mountain_car":
        from config_mountaincar import get_config

        cfg = get_config(num_repeat_actions=5)
        env = mountain_car_spec(dtype=fdt)
        steps = args.steps or 500
        warmup = 20
        threshold = args.threshold if args.threshold is not None else 0.12
    else:
        # same settings as the host-path baseline row (RESULTS.md /
        # scripts/reproduce_baselines.py workload_process_control)
        sys.path.insert(0, os.path.join(ROOT, "examples", "process_control"))
        from config_process_control import get_config

        cfg = get_config(len_horizon=5, include_time_model=False,
                         num_repeat_actions=5)
        env = process_control_spec(dtype=fdt)
        steps = args.steps or 500
        warmup = 100
        threshold = args.threshold if args.threshold is not None else 0.05

    mixed = args.dtype == "mixed"
    if mixed:
        assert jax.config.jax_enable_x64, "--dtype mixed needs GPMPC_TPU_X64=1"
        # mixed = f64 env dynamics + f64 master factorization, df32 rollout
        env = {"pendulum": pendulum_spec, "mountain_car": mountain_car_spec,
               "process_control": process_control_spec}[args.env](dtype=jnp.float64)
    cfg.dtype = "float32" if mixed else args.dtype
    spec, params0 = episode_spec_from_config(env, cfg, num_steps=steps, warmup=warmup,
                                             mixed_df32=mixed)
    keys = jax.random.split(jax.random.PRNGKey(0), args.seeds)

    import contextlib

    from gpmpc_tpu.ops import disable_pallas

    ctx = disable_pallas() if args.no_pallas else contextlib.nullcontext()
    with ctx:
        # build ONCE: a fresh build returns a new jit wrapper whose call
        # retraces the whole episode program (tens of seconds of host time),
        # which would masquerade as device time in the steady measurement
        batch_fn = build_episodes_batch_fn(spec, steps_per_call=args.steps_per_call)

        t0 = time.perf_counter()
        out = batch_fn(keys, params0)
        jax.block_until_ready(out["cost"])
        compile_and_run_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = batch_fn(keys, params0)
        jax.block_until_ready(out["cost"])
        steady_run_s = time.perf_counter() - t0

    costs = np.asarray(out["cost"])  # (seeds, steps)
    mean = costs.mean(axis=0)

    # interactions-to-solve: first t where mean cost over [t, t+20) < threshold
    window = 20
    solved_at = None
    for t in range(0, steps - window):
        if mean[t : t + window].mean() < threshold:
            solved_at = t
            break

    print(
        json.dumps(
            {
                "env": args.env,
                "seeds": args.seeds,
                "steps": steps,
                "mean_cost_last20": round(float(mean[-20:].mean()), 5),
                "interactions_to_solve": solved_at,
                "solve_threshold": threshold,
                "sweep_wall_s": round(steady_run_s, 2),
                "compile_plus_run_s": round(compile_and_run_s, 2),
                # complete-online-learning throughput: every env step of the
                # aggregate includes planning, memory filtering, incremental
                # factorization, and its share of periodic MLL training
                "aggregate_env_steps_per_sec": round(args.seeds * steps / steady_run_s, 2),
                "episodes_per_sec": round(args.seeds / steady_run_s, 3),
                "dtype": args.dtype,
            }
        )
    )


if __name__ == "__main__":
    main()
