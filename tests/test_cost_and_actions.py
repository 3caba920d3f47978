"""Cost mapper + action mapper tests — SURVEY.md §2 parity items 8, 13 and
component C11/C12/C14."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.mappers.action import ActionMapperSpec, mpc_to_model_actions, ste_clamp
from gpmpc_tpu.mappers.reward import RewardSpec, reward_single, reward_terminal, rewards_trajectory
from tests.oracle import np_oracle

NS, NA = 3, 1


def make_spec(use_constraints=False, clip=False, kappa=1.0, area_multiplier=1.0):
    w_state = np.array([1.0, 0.1, 0.1])
    w_action = np.array([0.05])
    W = np.diag(np.concatenate([w_state, w_action]))
    return RewardSpec(
        target_state_action_norm=jnp.asarray(np.array([1.0, 0.5, 0.5, 0.5])),
        weight_matrix_cost=jnp.asarray(W),
        target_state_norm=jnp.asarray(np.array([1.0, 0.5, 0.5])),
        weight_matrix_cost_terminal=jnp.asarray(np.diag([5.0, 2.0, 2.0])),
        use_constraints=use_constraints,
        state_min=jnp.asarray(np.array([-0.1, 0.05, 0.05])),
        state_max=jnp.asarray(np.array([1.1, 0.95, 0.925])),
        area_multiplier=area_multiplier,
        exploration_factor=kappa,
        clip_lower_bound_cost_to_0=clip,
    )


def test_reward_single_matches_oracle(rng):
    spec = make_spec()
    mu = rng.uniform(0, 1, NS)
    sv = rng.normal(0, 0.1, (NS, NS))
    var = sv @ sv.T * 0.01
    a = rng.uniform(0, 1, NA)
    r, rv = reward_single(spec, jnp.asarray(mu), jnp.asarray(var), jnp.asarray(a))
    W = np.asarray(spec.weight_matrix_cost)
    r_ref, rv_ref = np_oracle.reward(mu, var, a, np.asarray(spec.target_state_action_norm), W)
    np.testing.assert_allclose(float(r), r_ref, rtol=1e-10)
    np.testing.assert_allclose(float(rv), rv_ref, rtol=1e-10)


def test_reward_constraints_matches_oracle(rng):
    # area_multiplier != 1 must NOT change the penalty: the reference's live
    # get_reward path adds CDF penalties un-multiplied
    # (setpoint_distance_reward_mapper.py:66); only dead code applies it.
    spec = make_spec(use_constraints=True, area_multiplier=7.0)
    mu = rng.uniform(0, 1, NS)
    var = np.diag(rng.uniform(1e-4, 1e-2, NS))
    a = rng.uniform(0, 1, NA)
    r, rv = reward_single(spec, jnp.asarray(mu), jnp.asarray(var), jnp.asarray(a))
    r_ref, rv_ref = np_oracle.reward(
        mu, var, a, np.asarray(spec.target_state_action_norm), np.asarray(spec.weight_matrix_cost),
        use_constraints=True, state_min=np.asarray(spec.state_min), state_max=np.asarray(spec.state_max),
    )
    np.testing.assert_allclose(float(r), r_ref, rtol=1e-10)


def test_reward_terminal_matches_oracle(rng):
    spec = make_spec()
    mu = rng.uniform(0, 1, NS)
    var = np.diag(rng.uniform(1e-4, 1e-2, NS))
    r, rv = reward_terminal(spec, jnp.asarray(mu), jnp.asarray(var))
    r_ref, rv_ref = np_oracle.reward_terminal(mu, var, np.asarray(spec.target_state_norm), np.asarray(spec.weight_matrix_cost_terminal))
    np.testing.assert_allclose(float(r), r_ref, rtol=1e-10)
    np.testing.assert_allclose(float(rv), rv_ref, rtol=1e-10)


def test_rewards_trajectory_shapes(rng):
    spec = make_spec()
    nh = 5
    mus = rng.uniform(0, 1, (nh + 1, NS))
    vars_ = np.stack([np.diag(rng.uniform(1e-4, 1e-2, NS)) for _ in range(nh + 1)])
    acts = rng.uniform(0, 1, (nh, NA))
    r, rv = rewards_trajectory(spec, jnp.asarray(mus), jnp.asarray(vars_), jnp.asarray(acts))
    assert r.shape == (nh + 1,) and rv.shape == (nh + 1,)
    # terminal element uses terminal weights
    r_term_ref, _ = np_oracle.reward_terminal(
        mus[-1], vars_[-1], np.asarray(spec.target_state_norm), np.asarray(spec.weight_matrix_cost_terminal)
    )
    np.testing.assert_allclose(float(r[-1]), r_term_ref, rtol=1e-10)


def test_ste_clamp_gradient_passthrough():
    """SURVEY §2 C14: clamp forward, identity backward."""
    g = jax.grad(lambda x: jnp.sum(ste_clamp(x, 0.0, 1.0) * 3.0))(jnp.array([-0.5, 0.5, 1.5]))
    np.testing.assert_allclose(np.asarray(g), [3.0, 3.0, 3.0])


def test_normalization_action_mapping(rng):
    spec = ActionMapperSpec(
        limit_action_change=False, max_change_action_norm=jnp.asarray([0.3]), len_horizon=4, dim_action=1
    )
    flat = jnp.asarray(rng.uniform(0, 1, 4))
    out = mpc_to_model_actions(spec, flat, jnp.asarray([0.5]))
    np.testing.assert_allclose(np.asarray(out).ravel(), np.asarray(flat))


def test_derivative_action_mapping(rng):
    """Affine to [-mc, +mc], cumsum from previous action, STE clamp
    (reference derivative_action_mapper.py:28-35)."""
    mc = 0.3
    spec = ActionMapperSpec(
        limit_action_change=True, max_change_action_norm=jnp.asarray([mc]), len_horizon=3, dim_action=1
    )
    flat = np.array([0.5, 1.0, 0.0])  # deltas: 0, +mc, -mc
    prev = 0.4
    out = np.asarray(mpc_to_model_actions(spec, jnp.asarray(flat), jnp.asarray([prev]))).ravel()
    np.testing.assert_allclose(out, [0.4, 0.7, 0.4], atol=1e-12)


def test_derivative_action_clamped_but_grad_flows():
    mc = 0.5
    spec = ActionMapperSpec(
        limit_action_change=True, max_change_action_norm=jnp.asarray([mc]), len_horizon=2, dim_action=1
    )

    def f(flat):
        return jnp.sum(mpc_to_model_actions(spec, flat, jnp.asarray([0.9])))

    flat = jnp.asarray(np.array([1.0, 1.0]))  # pushes both steps past 1.0
    vals = mpc_to_model_actions(spec, flat, jnp.asarray([0.9]))
    np.testing.assert_allclose(np.asarray(vals).ravel(), [1.0, 1.0])
    g = np.asarray(jax.grad(f)(flat))
    assert np.all(g != 0.0)  # straight-through: gradient not killed at bound
