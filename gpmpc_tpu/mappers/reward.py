"""Setpoint quadratic cost with analytic mean AND variance under a Gaussian
state, optional probabilistic state-constraint penalties, and terminal cost.

Equivalent of the reference SetpointStateRewardMapper
(setpoint_distance_reward_mapper.py:8-162). Per stage, with the block-diagonal
weight W = blockdiag(diag(w_s), diag(w_a)), error e = [s; a] - target and
state-action covariance Sigma (action block zero):

  E[cost]   = tr(Sigma W) + e^T W e
  Var[cost] = 2 tr((W Sigma)^2) + 4 e^T W Sigma W e

Constraint penalties use per-dim Gaussian CDFs. NOTE (parity): the reference
passes the *variance* diagonal where its ``normal_cdf`` expects a standard
deviation (setpoint_distance_reward_mapper.py:58-60 passing
``state_var.diag()`` into ``normal_cdf(x, mu, sigma)``); we replicate that
behavior exactly since the published cost curves depend on it.

All functions are pure, differentiable, and vmapped over the horizon.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RewardSpec(NamedTuple):
    """Static+array reward description baked into the jitted plan."""

    target_state_action_norm: jnp.ndarray  # (Ns+Na,)
    weight_matrix_cost: jnp.ndarray  # (Ns+Na, Ns+Na)
    target_state_norm: jnp.ndarray  # (Ns,)
    weight_matrix_cost_terminal: jnp.ndarray  # (Ns, Ns)
    use_constraints: bool
    state_min: jnp.ndarray  # (Ns,)
    state_max: jnp.ndarray  # (Ns,)
    area_multiplier: float
    exploration_factor: float
    clip_lower_bound_cost_to_0: bool


def _normal_cdf(x, mu, sigma):
    """Reference normal_cdf (pytorch_utils.py:16-17)."""
    return 0.5 * (1.0 + jax.scipy.special.erf((x - mu) / (sigma * jnp.sqrt(2.0))))


def _quad_cost(error, sa_var, W) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cost_mu = jnp.trace(sa_var @ W) + error @ W @ error
    TS = W @ sa_var
    cost_var = 2.0 * jnp.trace(TS @ TS) + 4.0 * error @ TS @ W @ error
    return cost_mu, cost_var


def reward_single(spec: RewardSpec, state_mu, state_var, action) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage reward (negative cost) mean + cost variance for one state dist.

    Mirrors reference get_reward (setpoint_distance_reward_mapper.py:12-68).
    """
    ns = state_mu.shape[0]
    na = action.shape[0]
    dtype = state_mu.dtype
    error = jnp.concatenate([state_mu, action]) - spec.target_state_action_norm
    sa_var = jnp.zeros((ns + na, ns + na), dtype=dtype).at[:ns, :ns].set(state_var)
    cost_mu, cost_var = _quad_cost(error, sa_var, spec.weight_matrix_cost)

    if spec.use_constraints:
        # The reference's live code path (get_reward, used by
        # get_rewards_trajectory — setpoint_distance_reward_mapper.py:58-66)
        # adds the CDF penalties WITHOUT area_multiplier; only the dead
        # near-duplicate get_rewards applies it. Match the live path exactly
        # (same policy as the variance-as-sigma quirk below).
        var_diag = jnp.diagonal(state_var)
        pen_min = _normal_cdf(spec.state_min, state_mu, var_diag)
        pen_max = 1.0 - _normal_cdf(spec.state_max, state_mu, var_diag)
        cost_mu = cost_mu + pen_max.sum() + pen_min.sum()

    return -cost_mu, cost_var


def reward_terminal(spec: RewardSpec, state_mu, state_var) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Terminal reward with its own weights (reference
    setpoint_distance_reward_mapper.py:124-142)."""
    error = state_mu - spec.target_state_norm
    cost_mu, cost_var = _quad_cost(error, state_var, spec.weight_matrix_cost_terminal)
    return -cost_mu, cost_var


def rewards_trajectory(spec: RewardSpec, states_mu, states_var, actions) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage rewards on states[:-1] with actions, plus terminal on states[-1].

    Mirrors reference get_rewards_trajectory
    (setpoint_distance_reward_mapper.py:144-149). Returns ((Nh+1,), (Nh+1,)).
    """
    stage_fn = jax.vmap(lambda m, v, a: reward_single(spec, m, v, a))
    r_stage, rv_stage = stage_fn(states_mu[:-1], states_var[:-1], actions)
    r_term, rv_term = reward_terminal(spec, states_mu[-1], states_var[-1])
    rewards = jnp.concatenate([r_stage, r_term[None]])
    rewards_var = jnp.concatenate([rv_stage, rv_term[None]])
    return rewards, rewards_var
