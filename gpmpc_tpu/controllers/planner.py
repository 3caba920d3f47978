"""On-device MPC planning step: factorize -> rollout -> cost -> L-BFGS-B.

This is the TPU-native replacement for the reference's planning hot path
(gp_mpc_controller.py:114-153 `_get_optimal_actions` +
:229-285 `compute_mean_lcb_trajectory`): one jitted XLA program performs the
masked Cholesky factorization, the moment-matched lax.scan rollout, the
reward-UCB objective with reverse-mode autodiff, and the full box-constrained
L-BFGS optimization with all restarts batched by vmap. The host passes in the
(padded) memory and receives the optimal action sequence plus all iteration
diagnostics — one device call per planning step instead of one per objective
evaluation.

Objective (reference gp_mpc_controller.py:269-276):
  minimize  -mean( reward_traj + exploration_factor * sqrt(var_traj) )
over flat actions in [0,1]^(Nh*Na), horizon including the terminal stage,
optionally clamping the reward UCB to <= 0 with a straight-through clamp.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mappers.action import ActionMapperSpec, mpc_to_model_actions, ste_clamp
from ..mappers.reward import RewardSpec, rewards_trajectory
from ..models.gp import (
    FactorizationCache,
    GPBounds,
    GPParams,
    masked_cholesky_factorize,
    predict_trajectory,
)
from .lbfgs import lbfgs_b_minimize


class PlanSpec(NamedTuple):
    """Static planning configuration baked into the jitted functions."""

    reward: RewardSpec
    action: ActionMapperSpec
    include_time_model: bool
    len_horizon: int
    dim_action: int
    dim_state: int
    maxiter: int
    maxcor: int
    maxls: int


class TrajectoryInfo(NamedTuple):
    """Diagnostics of the chosen trajectory (feeds IterationInformation)."""

    states_mu_pred: jnp.ndarray  # (Nh+1, Ns)
    states_var_pred: jnp.ndarray  # (Nh+1, Ns, Ns)
    rewards_traj: jnp.ndarray  # (Nh+1,)
    rewards_traj_var: jnp.ndarray  # (Nh+1,)
    mean_reward_ucb: jnp.ndarray  # scalar — LCB of the mean cost, negated


def _objective_and_info(
    spec: PlanSpec,
    cache: FactorizationCache,
    actions_mpc: jnp.ndarray,
    state_mu: jnp.ndarray,
    state_var: jnp.ndarray,
    action_prev: jnp.ndarray,
    iter_ctrl: jnp.ndarray,
) -> Tuple[jnp.ndarray, TrajectoryInfo]:
    actions_model = mpc_to_model_actions(spec.action, actions_mpc, action_prev)
    states_mu, states_var = predict_trajectory(
        cache, actions_model, state_mu, state_var, iter_ctrl, spec.include_time_model
    )
    rewards, rewards_var = rewards_trajectory(spec.reward, states_mu, states_var, actions_model)
    ucb = rewards + spec.reward.exploration_factor * jnp.sqrt(rewards_var)
    if spec.reward.clip_lower_bound_cost_to_0:
        ucb = ste_clamp(ucb, -jnp.inf, 0.0)
    mean_ucb = jnp.mean(ucb)
    info = TrajectoryInfo(states_mu, states_var, rewards, rewards_var, mean_ucb)
    return -mean_ucb, info


def build_plan_fn(spec: PlanSpec):
    """Jitted planner: all restarts optimized in parallel, best kept.

    Returns fn(x_pad, y_pad, mask, params, bounds, state_mu, state_var,
               inits (R, Nh*Na), action_prev, iter_ctrl)
        -> (actions_mpc_opt (Nh*Na,), actions_model (Nh, Na), TrajectoryInfo)
    """

    def plan(x_pad, y_pad, mask, params: GPParams, bounds: GPBounds, state_mu, state_var, inits, action_prev, iter_ctrl):
        cache = masked_cholesky_factorize(params, bounds, x_pad, y_pad, mask)

        def objective(a):
            cost, _ = _objective_and_info(spec, cache, a, state_mu, state_var, action_prev, iter_ctrl)
            return cost

        lower = jnp.zeros_like(inits[0])
        upper = jnp.ones_like(inits[0])

        def one_restart(a0):
            return lbfgs_b_minimize(
                objective, a0, lower, upper,
                maxiter=spec.maxiter, maxcor=spec.maxcor, maxls=spec.maxls, keep_best=True,
            )

        xs, fs = jax.vmap(one_restart)(inits)  # (R, n), (R,)
        # best restart; NaN objective falls back to the first restart
        # (reference gp_mpc_controller.py:146-148)
        fs_safe = jnp.where(jnp.isnan(fs), jnp.inf, fs)
        all_nan = jnp.all(jnp.isnan(fs))
        best = jnp.where(all_nan, 0, jnp.argmin(fs_safe))
        a_opt = xs[best]

        cost, info = _objective_and_info(spec, cache, a_opt, state_mu, state_var, action_prev, iter_ctrl)
        actions_model = mpc_to_model_actions(spec.action, a_opt, action_prev)
        return a_opt, actions_model, info

    return jax.jit(plan)


def build_eval_fn(spec: PlanSpec):
    """Jitted single-sequence evaluation (used for the random-warmup rollout,
    reference gp_mpc_controller.py:155-163)."""

    def evaluate(x_pad, y_pad, mask, params: GPParams, bounds: GPBounds, state_mu, state_var, actions_mpc, action_prev, iter_ctrl):
        cache = masked_cholesky_factorize(params, bounds, x_pad, y_pad, mask)
        cost, info = _objective_and_info(spec, cache, actions_mpc, state_mu, state_var, action_prev, iter_ctrl)
        actions_model = mpc_to_model_actions(spec.action, actions_mpc, action_prev)
        return actions_model, info

    return jax.jit(evaluate)


class Planner:
    """Caches jitted plan/eval functions keyed by the memory bucket size."""

    def __init__(self, spec: PlanSpec):
        self.spec = spec
        self._plan_fns: Dict[int, object] = {}
        self._eval_fns: Dict[int, object] = {}
        self._plan = build_plan_fn(spec)
        self._eval = build_eval_fn(spec)

    def plan(self, x_pad, y_pad, mask, params, bounds, state_mu, state_var, inits, action_prev, iter_ctrl):
        return self._plan(x_pad, y_pad, mask, params, bounds, state_mu, state_var, inits, action_prev, iter_ctrl)

    def evaluate(self, x_pad, y_pad, mask, params, bounds, state_mu, state_var, actions_mpc, action_prev, iter_ctrl):
        return self._eval(x_pad, y_pad, mask, params, bounds, state_mu, state_var, actions_mpc, action_prev, iter_ctrl)
