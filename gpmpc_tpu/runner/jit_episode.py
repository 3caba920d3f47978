"""Fully on-device online-learning episodes.

The reference's outer loop (run_env_function.py:14-49) steps the env on the
host and crosses into torch/SciPy for every planning step; its multi-run
evaluation (``run_env_multiple``) is a serial host loop. Here the ENTIRE
episode — warmup randomization, MPC planning (factorize + moment-matched
rollout + box-L-BFGS), the storage-filtered transition memory, periodic MLL
hyperparameter training, and the environment dynamics themselves — is one
``lax.scan`` compiled to a single XLA program. ``run_episodes_batch`` vmaps
it over seeds, so a 10-seed evaluation sweep costs about one episode of
wall-clock on a TPU.

Semantics follow the host controller (controllers/controller.py) which in
turn mirrors the reference (SURVEY.md §2): planning only on
``t % num_repeat_actions == 0`` with cached-action replay in between; warmup
steps take uniform-random action sequences but still roll the model forward
for the memory filter's prediction; training fires when
``(t+1) % training_frequency == 0`` (synchronous here — the scan body is
already on-device, so there is no host latency to hide).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config.configs import Config
from ..controllers.lbfgs import lbfgs_b_minimize
from ..controllers.planner import PlanSpec, _objective_and_info
from ..envs.jax_dynamics import JaxEnvSpec
from ..mappers.action import ActionMapperSpec, mpc_to_model_actions
from ..mappers.reward import RewardSpec, reward_single
from ..models.gp import (
    GPBounds,
    GPParams,
    TrainConfigDevice,
    masked_cholesky_factorize,
    params_from_constrained,
    train_hyperparams,
)


class MemoryState(NamedTuple):
    """Fixed-capacity device-resident transition memory (see
    memory/buffer.py for the host twin and semantics provenance)."""

    inputs: jnp.ndarray  # (cap, D) raw per-step transitions
    states_next: jnp.ndarray  # (cap, Ns)
    flags: jnp.ndarray  # (cap,) storage-filter decisions
    model_inputs: jnp.ndarray  # (model_cap, D) materialized GP points
    model_targets: jnp.ndarray  # (model_cap, Ns)
    len_mem: jnp.ndarray  # i32
    len_last: jnp.ndarray  # i32
    len_model: jnp.ndarray  # i32


def memory_init(cap: int, d: int, ns: int, dtype,
                model_cap: int | None = None) -> MemoryState:
    """model_cap sizes the GP-point buffers independently of the raw
    transition log: with action repeat k only every k-th raw row can become
    a model point, so model_cap = cap // k + 1 (bucketed) bounds them
    exactly. The (Ns, model_cap, model_cap) factorization/Gram work — the
    episode's dominant compute and XLA:CPU's dominant compile cost — then
    scales with the true point count, not the step count (a 500-step
    action-repeat-5 episode needs model_cap 128, not 512)."""
    mcap = cap if model_cap is None else model_cap
    return MemoryState(
        inputs=jnp.zeros((cap, d), dtype),
        states_next=jnp.zeros((cap, ns), dtype),
        flags=jnp.zeros((cap,), bool),
        model_inputs=jnp.zeros((mcap, d), dtype),
        model_targets=jnp.zeros((mcap, ns), dtype),
        len_mem=jnp.zeros((), jnp.int32),
        len_last=jnp.zeros((), jnp.int32),
        len_model=jnp.zeros((), jnp.int32),
    )


def memory_add(mem: MemoryState, x_row, s_next, store_flag) -> MemoryState:
    i = mem.len_mem
    return mem._replace(
        inputs=mem.inputs.at[i].set(x_row),
        states_next=mem.states_next.at[i].set(s_next),
        flags=mem.flags.at[i].set(store_flag),
        len_mem=i + 1,
    )


def memory_prepare(mem: MemoryState, step_model: int, ns: int) -> MemoryState:
    """Materialize model inputs/targets from unprocessed rows (masked scatter
    equivalent of gp_memory.py:66-83; targets y_i = s_next[i+k-1] - s[i])."""
    cap = mem.inputs.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    elig = (
        (idx % step_model == 0)
        & (idx >= mem.len_last)
        & (idx < mem.len_mem)
        & mem.flags
        & (idx + step_model - 1 < mem.len_mem)
    )
    mcap = mem.model_inputs.shape[0]
    offs = jnp.cumsum(elig.astype(jnp.int32)) - 1
    pos = jnp.where(elig, mem.len_model + offs, mcap)  # mcap = dropped
    tgt_idx = jnp.minimum(idx + step_model - 1, cap - 1)
    targets = mem.states_next[tgt_idx] - mem.inputs[:, :ns]
    return mem._replace(
        model_inputs=mem.model_inputs.at[pos].set(mem.inputs, mode="drop"),
        model_targets=mem.model_targets.at[pos].set(targets, mode="drop"),
        len_model=(mem.len_model + jnp.sum(elig.astype(jnp.int32))).astype(jnp.int32),
        len_last=mem.len_mem,
    )


def memory_active_mask(mem: MemoryState) -> jnp.ndarray:
    mcap = mem.model_inputs.shape[0]
    # empty memory -> single dummy zero point (gp_memory.py:109-111);
    # model buffers are zero-initialized so row 0 is exactly that point.
    n = jnp.maximum(mem.len_model, 1)
    return jnp.arange(mcap, dtype=jnp.int32) < n


class EpisodeSpec(NamedTuple):
    """Everything static about the episode, baked into the jitted scan."""

    env: JaxEnvSpec
    plan: PlanSpec
    bounds: GPBounds
    train_cfg: TrainConfigDevice
    obs_var_norm_diag: jnp.ndarray  # (Ns,)
    thr_err: jnp.ndarray  # (Ns,)
    thr_std: jnp.ndarray  # (Ns,)
    check_storage: bool
    num_steps: int
    warmup: int
    cap: int
    num_repeat_actions: int
    training_frequency: int
    restarts_optim: int
    init_from_previous_actions: bool
    include_time_model: bool
    dtype: object
    # test hook: replace random L-BFGS inits / warmup action sequences with
    # 0.5-constants so the fused path can be compared step-for-step against
    # the host controller (tests/test_cross_path.py)
    deterministic_inits: bool = False
    # parallel random-restart re-inits per MLL training call (the host
    # controller reads config.training.restarts_train the same way)
    restarts_train: int = 1
    # mixed precision: factorize + train in f64, roll out in double-float32
    # (models/gp.split_cache_df) — the TPU path for training-sharpened GPs
    # where plain f32 breaks (PERFORMANCE.md precision boundary). Requires
    # jax_enable_x64 and dtype float32.
    mixed_df32: bool = False
    # GP-point buffer capacity; None = cap. With action repeat k only every
    # k-th raw row can materialize as a model point, so the exact bound
    # cap // k + 1 (bucketed to 32) keeps the (Ns, model_cap, model_cap)
    # factorization work sized to the point count, not the step count.
    model_cap: int | None = None


def _model_cap_for(cap: int, num_repeat_actions: int) -> int:
    """Exact bucketed bound on materialized GP points: raw rows at indices
    0, k, 2k, ... of a cap-row log -> cap // k + 1 candidates."""
    if num_repeat_actions <= 1:
        return cap
    pts = cap // num_repeat_actions + 1
    return min(cap, max(32, int(np.ceil(pts / 32.0)) * 32))


def episode_spec_from_config(
    env: JaxEnvSpec,
    config: Config,
    num_steps: int,
    warmup: int,
    cap=None,
    deterministic_inits: bool = False,
    mixed_df32: bool = False,
) -> Tuple[EpisodeSpec, GPParams]:
    dtype = jnp.float64 if config.dtype == "float64" else jnp.float32
    ns = len(env.obs_low)
    na = len(env.act_low)
    d = ns + na + (1 if config.model.include_time_model else 0)
    if cap is None:
        cap = max(32, int(np.ceil(num_steps / 32.0)) * 32)

    rm = config.model.resolved(ns, d)
    bounds = GPBounds(
        min_lengthscale=jnp.asarray(rm.min_lengthscale, dtype),
        max_lengthscale=jnp.asarray(rm.max_lengthscale, dtype),
        min_outputscale=jnp.asarray(rm.min_outputscale, dtype),
        max_outputscale=jnp.asarray(rm.max_outputscale, dtype),
        min_noise=jnp.asarray(rm.min_noise_var, dtype),
        max_noise=jnp.asarray(rm.max_noise_var, dtype),
    )
    params0 = params_from_constrained(
        jnp.asarray(rm.init_lengthscale, dtype),
        jnp.asarray(rm.init_outputscale, dtype),
        jnp.asarray(rm.init_noise_var, dtype),
        bounds,
    )

    rc = config.reward
    w = np.diag(np.concatenate([np.asarray(rc.weight_state, float), np.asarray(rc.weight_action, float)]))
    reward_spec = RewardSpec(
        target_state_action_norm=jnp.asarray(
            np.concatenate([np.asarray(rc.target_state_norm, float), np.asarray(rc.target_action_norm, float)]), dtype
        ),
        weight_matrix_cost=jnp.asarray(w, dtype),
        target_state_norm=jnp.asarray(np.asarray(rc.target_state_norm, float), dtype),
        weight_matrix_cost_terminal=jnp.asarray(np.diag(np.asarray(rc.weight_state_terminal, float)), dtype),
        use_constraints=bool(rc.use_constraints),
        state_min=jnp.asarray(np.asarray(rc.state_min, float), dtype),
        state_max=jnp.asarray(np.asarray(rc.state_max, float), dtype),
        area_multiplier=float(rc.area_multiplier),
        exploration_factor=float(rc.exploration_factor),
        clip_lower_bound_cost_to_0=bool(rc.clip_lower_bound_cost_to_0),
    )
    action_spec = ActionMapperSpec(
        limit_action_change=bool(config.actions.limit_action_change),
        max_change_action_norm=jnp.asarray(np.asarray(config.actions.max_change_action_norm, float), dtype),
        len_horizon=config.controller.len_horizon,
        dim_action=na,
    )
    opt = config.controller.actions_optimizer_params
    plan_spec = PlanSpec(
        reward=reward_spec,
        action=action_spec,
        include_time_model=bool(config.model.include_time_model),
        len_horizon=config.controller.len_horizon,
        dim_action=na,
        dim_state=ns,
        maxiter=int(opt.get("maxiter", 30)),
        maxcor=int(opt.get("maxcor", 30)),
        maxls=int(opt.get("maxls", opt.get("maxiter", 30))),
        maxfun=int(opt["maxfun"]) if "maxfun" in opt else None,
    )
    tc = config.training
    train_cfg = TrainConfigDevice(
        lr=float(tc.lr_train), iters=int(tc.iter_train) * 20, clip_grad_value=float(tc.clip_grad_value)
    )

    spec = EpisodeSpec(
        env=env,
        plan=plan_spec,
        bounds=bounds,
        train_cfg=train_cfg,
        obs_var_norm_diag=jnp.asarray(np.asarray(config.observation.obs_var_norm, float), dtype),
        thr_err=jnp.asarray(np.asarray(config.memory.min_error_prediction_state_for_memory, float), dtype),
        thr_std=jnp.asarray(np.asarray(config.memory.min_prediction_state_std_for_memory, float), dtype),
        check_storage=bool(config.memory.check_errors_for_storage),
        num_steps=num_steps,
        warmup=warmup,
        cap=int(cap),
        num_repeat_actions=int(config.controller.num_repeat_actions),
        training_frequency=int(config.training.training_frequency),
        restarts_optim=max(1, int(config.controller.restarts_optim)),
        init_from_previous_actions=bool(config.controller.init_from_previous_actions),
        include_time_model=bool(config.model.include_time_model),
        dtype=dtype,
        deterministic_inits=bool(deterministic_inits),
        restarts_train=max(1, int(tc.restarts_train)),
        mixed_df32=bool(mixed_df32),
        model_cap=_model_cap_for(int(cap), int(config.controller.num_repeat_actions)),
    )
    if mixed_df32:
        assert dtype == jnp.float32 and jax.config.jax_enable_x64, (
            "mixed_df32 needs dtype float32 and jax_enable_x64"
        )
    return spec, params0


def _build_episode_parts(spec: EpisodeSpec):
    """Untraced building blocks: (init_carry, step). build_episode_fn scans
    step over the whole episode in one program; build_episodes_batch_fn can
    instead stitch bounded segments (steps_per_call)."""
    env = spec.env
    ns = len(env.obs_low)
    na = len(env.act_low)
    d = ns + na + (1 if spec.include_time_model else 0)
    dtype = spec.dtype
    nh = spec.plan.len_horizon
    n_flat = nh * na

    obs_low = jnp.asarray(env.obs_low, dtype)
    obs_high = jnp.asarray(env.obs_high, dtype)
    act_low = jnp.asarray(env.act_low, dtype)
    act_high = jnp.asarray(env.act_high, dtype)
    obs_var = jnp.diag(spec.obs_var_norm_diag)

    def norm_obs(obs):
        return (obs - obs_low) / (obs_high - obs_low)

    def denorm_act(a):
        return a * (act_high - act_low) + act_low

    def make_cache(mem: MemoryState, params, mask):
        if spec.mixed_df32:
            from ..models.gp import split_cache_df

            cache64 = masked_cholesky_factorize(
                params, spec.bounds, mem.model_inputs, mem.model_targets, mask, upcast=True
            )
            return split_cache_df(cache64)
        return masked_cholesky_factorize(params, spec.bounds, mem.model_inputs, mem.model_targets, mask)

    def plan_actions(mem: MemoryState, params, state_mu, prev_mpc, have_prev, action_prev, t, key):
        mask = memory_active_mask(mem)
        cache = make_cache(mem, params, mask)

        def objective(a):
            cost, _ = _objective_and_info(spec.plan, cache, a, state_mu, obs_var, action_prev, t)
            return cost

        k_init, k_warm = jax.random.split(key)
        if spec.deterministic_inits:
            inits = jnp.full((spec.restarts_optim, n_flat), 0.5, dtype)
        else:
            inits = jax.random.uniform(k_init, (spec.restarts_optim, n_flat), dtype)
        if spec.init_from_previous_actions:
            warm = jnp.concatenate([prev_mpc[na:], prev_mpc[-na:]])
            inits = inits.at[0].set(jnp.where(have_prev, warm, inits[0]))

        lower = jnp.zeros((n_flat,), dtype)
        upper = jnp.ones((n_flat,), dtype)

        def one(a0):
            return lbfgs_b_minimize(
                objective, a0, lower, upper,
                maxiter=spec.plan.maxiter, maxcor=spec.plan.maxcor, maxls=spec.plan.maxls, keep_best=True,
                maxfun=spec.plan.maxfun,
            )

        xs, fs = jax.vmap(one)(inits)
        fs_safe = jnp.where(jnp.isnan(fs), jnp.inf, fs)
        best = jnp.where(jnp.all(jnp.isnan(fs)), 0, jnp.argmin(fs_safe))
        a_opt = xs[best]
        _, info = _objective_and_info(spec.plan, cache, a_opt, state_mu, obs_var, action_prev, t)
        return a_opt, info

    def eval_actions(mem: MemoryState, params, state_mu, actions_mpc, action_prev, t):
        mask = memory_active_mask(mem)
        cache = make_cache(mem, params, mask)
        _, info = _objective_and_info(spec.plan, cache, actions_mpc, state_mu, obs_var, action_prev, t)
        return actions_mpc, info

    def step(carry, t):
        (env_state, obs, mem, params, action_raw_cached, action_model_prev, prev_mpc, have_prev, pred_state, pred_std, key, train_base) = carry
        key, k_plan, k_env, k_rand = jax.random.split(key, 4)

        planning = (t % spec.num_repeat_actions) == 0
        state_mu = norm_obs(obs)

        def do_plan(_):
            mem2 = memory_prepare(mem, spec.num_repeat_actions, ns)
            random_step = t < spec.warmup

            if spec.deterministic_inits:
                rand_mpc = jnp.full((n_flat,), 0.5, dtype)
            else:
                rand_mpc = jax.random.uniform(k_rand, (n_flat,), dtype)

            def plan_branch(_):
                return plan_actions(mem2, params, state_mu, prev_mpc, have_prev, action_model_prev, t, k_plan)

            def rand_branch(_):
                return eval_actions(mem2, params, state_mu, rand_mpc, action_model_prev, t)

            a_opt, info = lax.cond(random_step, rand_branch, plan_branch, None)
            actions_model = mpc_to_model_actions(spec.plan.action, a_opt, action_model_prev)
            a_model0 = actions_model[0]
            a_raw = denorm_act(a_model0)
            p_state = info.states_mu_pred[1]
            p_std = jnp.sqrt(jnp.maximum(jnp.diagonal(info.states_var_pred[1]), 0.0))
            return mem2, a_raw, a_model0, a_opt, jnp.asarray(True), p_state, p_std

        def no_plan(_):
            return mem, action_raw_cached, action_model_prev, prev_mpc, have_prev, pred_state, pred_std

        mem, a_raw, a_model0, prev_mpc2, have_prev2, pred_state2, pred_std2 = lax.cond(planning, do_plan, no_plan, None)

        # realized cost of (obs, action) — compute_cost_unnormalized equivalent
        a_model_now = (a_raw - act_low) / (act_high - act_low)
        reward_now, _ = reward_single(spec.plan.reward, state_mu, obs_var, a_model_now)
        cost_now = -reward_now

        env_state2, obs_new, env_reward = env.step_fn(env_state, a_raw, k_env)
        # under mixed df32 (jax_enable_x64 on, control dtype f32) the env
        # dynamics run in f64 — cast the observation back to the carry dtype
        obs_new = jnp.asarray(obs_new, dtype)

        # memory add with storage filter (gp_memory.py:31-64)
        s_next = norm_obs(obs_new)
        x_row = jnp.zeros((d,), dtype).at[:ns].set(state_mu).at[ns : ns + na].set(a_model_now)
        if spec.include_time_model:
            x_row = x_row.at[-1].set(t.astype(dtype))
        if spec.check_storage:
            err = jnp.abs(pred_state2 - s_next)
            store = jnp.any(err > spec.thr_err) & jnp.any(pred_std2 > spec.thr_std)
        else:
            store = jnp.asarray(True)
        mem = memory_add(mem, x_row, s_next, store)

        # periodic synchronous training ((t+1) % frequency == 0); the key
        # protocol fold_in(train_base, t + 1) is SHARED with the host
        # controller (controllers/controller.py start_training_process,
        # which folds in iter_ctrl == t + 1) so both paths train with
        # identical randomness given the same seed (cross-path tests)
        def do_train(p):
            mem3 = memory_prepare(mem, spec.num_repeat_actions, ns)
            mask = memory_active_mask(mem3)
            k_train = jax.random.fold_in(train_base, t + 1)
            if spec.mixed_df32:
                # MLL conditioning needs f64 once noise sharpens; raw params
                # are logit-space and cast back losslessly for control purposes
                p64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), p)
                b64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), spec.bounds)
                new_p, _ = train_hyperparams(
                    p64, b64,
                    mem3.model_inputs.astype(jnp.float64), mem3.model_targets.astype(jnp.float64),
                    mask, k_train, spec.train_cfg, restarts=spec.restarts_train,
                )
                return jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), new_p)
            new_p, _ = train_hyperparams(
                p, spec.bounds, mem3.model_inputs, mem3.model_targets, mask, k_train,
                spec.train_cfg, restarts=spec.restarts_train,
            )
            return new_p

        params = lax.cond((t + 1) % spec.training_frequency == 0, do_train, lambda p: p, params)

        out = {
            "obs": obs,
            "action_raw": a_raw,
            "cost": cost_now,
            "env_reward": env_reward,
            "pred_state": pred_state2,
            "pred_std": pred_std2,
        }
        carry = (env_state2, obs_new, mem, params, a_raw, a_model0, prev_mpc2, have_prev2, pred_state2, pred_std2, key, train_base)
        return carry, out

    def init_carry(key, params0: GPParams):
        from ..controllers.controller import TRAIN_KEY_TAG

        k_init, k_scan, k_prev = jax.random.split(key, 3)
        env_state, obs = env.init_fn(k_init)
        mem = memory_init(spec.cap, d, ns, dtype, model_cap=spec.model_cap)
        return (
            env_state,
            jnp.asarray(obs, dtype),
            mem,
            params0,
            jnp.zeros((na,), dtype),
            jax.random.uniform(k_prev, (na,), dtype),
            jnp.zeros((n_flat,), dtype),
            jnp.asarray(False),
            jnp.zeros((ns,), dtype),
            jnp.zeros((ns,), dtype),
            k_scan,
            # training-key base: same derivation as the host controller's
            # _train_key so fold_in(base, t + 1) matches across paths
            jax.random.fold_in(key, TRAIN_KEY_TAG),
        )

    return init_carry, step


def _finalize_outs(outs, carry):
    outs["final_params"] = carry[3]
    outs["final_obs"] = carry[1]  # obs AFTER the last step
    outs["final_mem"] = carry[2]  # full MemoryState (cross-path equivalence checks)
    return outs


def build_episode_fn(spec: EpisodeSpec):
    """Returns jitted fn(key, params0) -> dict with per-step costs/states/actions."""
    init_carry, step = _build_episode_parts(spec)

    def episode(key, params0: GPParams):
        carry = init_carry(key, params0)
        carry, outs = lax.scan(step, carry, jnp.arange(spec.num_steps, dtype=jnp.int32))
        return _finalize_outs(outs, carry)

    return jax.jit(episode)


def build_episodes_batch_fn(spec: EpisodeSpec, steps_per_call: int | None = None):
    """fn(keys, params0): the episode vmapped over seeds — the TPU-native
    run_env_multiple. Build ONCE and reuse: each build returns a fresh jit
    wrapper, so calling through a new build retraces the whole episode
    program (L-BFGS + rollout VJPs — tens of seconds of host time) even
    when the executable reloads from the compilation cache.

    steps_per_call bounds the duration of each device dispatch by splitting
    the episode scan into host-stitched segments (the carry never leaves the
    device; each boundary costs one dispatch round-trip, ~26 ms on the
    tunnel-attached host). Long single dispatches (minutes) have been
    observed to trip remote-runtime execution limits ("TPU worker process
    crashed or restarted" on a pure-XLA matmul scan of the same duration —
    scripts/check_gram_vmap.py history); segmenting also deflakes long
    batched sweeps. The scan math is identical — segment boundaries only
    change XLA fusion boundaries, not operation order. Pick a divisor of
    num_steps or pay one extra compile for the remainder segment."""
    if steps_per_call is None or steps_per_call >= spec.num_steps:
        fn = build_episode_fn(spec)
        return jax.jit(jax.vmap(fn, in_axes=(0, None)))

    init_carry, step = _build_episode_parts(spec)
    init_b = jax.jit(jax.vmap(init_carry, in_axes=(0, None)))

    def segment(carry, ts):
        return lax.scan(step, carry, ts)

    seg_b = jax.jit(jax.vmap(segment, in_axes=(0, None), out_axes=(0, 0)))

    def run(keys, params0):
        carry = init_b(keys, params0)
        chunks = []
        for s0 in range(0, spec.num_steps, steps_per_call):
            ts = jnp.arange(s0, min(s0 + steps_per_call, spec.num_steps), dtype=jnp.int32)
            carry, outs = seg_b(carry, ts)
            chunks.append(outs)
        outs = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=1), *chunks)
        return _finalize_outs(outs, carry)

    return run


def run_episodes_batch(spec: EpisodeSpec, params0: GPParams, keys,
                       steps_per_call: int | None = None):
    """One-shot convenience wrapper over build_episodes_batch_fn."""
    return build_episodes_batch_fn(spec, steps_per_call=steps_per_call)(keys, params0)
