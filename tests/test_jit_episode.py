"""Fused on-device episode tests: semantics + batched multi-seed runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.envs.jax_dynamics import mountain_car_spec, pendulum_spec, process_control_spec
from gpmpc_tpu.runner.jit_episode import (
    MemoryState,
    build_episode_fn,
    episode_spec_from_config,
    memory_active_mask,
    memory_add,
    memory_init,
    memory_prepare,
    run_episodes_batch,
)
from tests.test_controller_integration import small_pendulum_config


def test_memory_prepare_matches_host_semantics():
    """Device memory_prepare must agree with the host Memory on stride,
    filter, and target formation."""
    from gpmpc_tpu.config.configs import MemoryConfig
    from gpmpc_tpu.memory.buffer import Memory

    ns, na, k, cap = 2, 1, 3, 32
    rng = np.random.default_rng(0)
    host = Memory(
        MemoryConfig(check_errors_for_storage=False, points_batch_memory=cap), dim_input=ns + na, dim_state=ns, step_model=k
    )
    dev = memory_init(cap, ns + na, ns, jnp.float64)

    states = rng.uniform(0, 1, (13, ns))
    for i in range(12):
        a = rng.uniform(0, 1, (na,))
        host.add(states[i], a, states[i + 1], 0.0, i)
        x_row = jnp.concatenate([jnp.asarray(states[i]), jnp.asarray(a)])
        dev = memory_add(dev, x_row, jnp.asarray(states[i + 1]), jnp.asarray(True))

    host.prepare_for_model()
    dev = memory_prepare(dev, k, ns)

    hx, hy = host.get()
    n = int(dev.len_model)
    assert n == len(hx)
    np.testing.assert_allclose(np.asarray(dev.model_inputs[:n]), hx, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dev.model_targets[:n]), hy, atol=1e-12)


def test_memory_prepare_respects_filter_flags():
    ns, na, cap = 2, 1, 16
    dev = memory_init(cap, ns + na, ns, jnp.float64)
    for i in range(6):
        dev = memory_add(
            dev, jnp.full((3,), float(i)), jnp.full((2,), float(i + 1)), jnp.asarray(i % 2 == 0)
        )
    dev = memory_prepare(dev, 1, ns)
    assert int(dev.len_model) == 3  # only even-indexed stored
    np.testing.assert_allclose(np.asarray(dev.model_inputs[:3, 0]), [0.0, 2.0, 4.0])


def test_empty_memory_mask_has_dummy_point():
    dev = memory_init(8, 3, 2, jnp.float64)
    mask = memory_active_mask(dev)
    assert int(mask.sum()) == 1 and bool(mask[0])


@pytest.mark.slow
def test_fused_pendulum_episode_runs_and_learns():
    cfg = small_pendulum_config()
    cfg.training.training_frequency = 10
    env = pendulum_spec()
    spec, params0 = episode_spec_from_config(env, cfg, num_steps=40, warmup=8, cap=64)
    fn = build_episode_fn(spec)
    out = fn(jax.random.PRNGKey(0), params0)
    costs = np.asarray(out["cost"])
    assert costs.shape == (40,)
    assert np.all(np.isfinite(costs))
    # memory filter predictions recorded
    assert np.all(np.isfinite(np.asarray(out["pred_state"])))


@pytest.mark.slow
def test_fused_batch_over_seeds():
    cfg = small_pendulum_config()
    cfg.training.training_frequency = 1000  # no training, keep it light
    cfg.controller.actions_optimizer_params = {"maxiter": 2, "maxcor": 3, "maxls": 3}
    env = pendulum_spec()
    spec, params0 = episode_spec_from_config(env, cfg, num_steps=12, warmup=4, cap=32)
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    out = run_episodes_batch(spec, params0, keys)
    costs = np.asarray(out["cost"])
    assert costs.shape == (3, 12)
    assert np.all(np.isfinite(costs))
    # different seeds -> different trajectories
    assert not np.allclose(costs[0], costs[1])

    # bounded-dispatch segmented execution (steps_per_call) stitches the
    # same scan over host-dispatched chunks — same math, same results
    seg = run_episodes_batch(spec, params0, keys, steps_per_call=5)
    seg_costs = np.asarray(seg["cost"])
    assert seg_costs.shape == (3, 12)
    np.testing.assert_allclose(seg_costs, costs, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(seg["final_obs"]), np.asarray(out["final_obs"]),
        rtol=5e-4, atol=5e-5,
    )


@pytest.mark.slow
def test_fused_process_control_with_param_changes():
    from gpmpc_tpu.config.configs import Config
    from tests.test_controller_integration import small_pendulum_config as _unused

    import tests.test_controller_integration as tci

    env = process_control_spec(change_params=True, period_change=8)
    # reuse the 2-dim process-control config from the integration tests
    cfg = None
    # build a minimal 2-dim config
    from gpmpc_tpu import (
        ActionsConfig,
        ControllerConfig,
        MemoryConfig,
        ModelConfig,
        ObservationConfig,
        RewardConfig,
        TrainingConfig,
    )

    cfg = Config(
        observation_config=ObservationConfig(obs_var_norm=[1e-6, 1e-6]),
        reward_config=RewardConfig(
            target_state_norm=[0.5, 0.5],
            weight_state=[1, 1],
            weight_state_terminal=[1, 1],
            target_action_norm=[0.0, 0.0],
            weight_action=[1e-4, 1e-4],
            exploration_factor=1,
            state_min=[0.1, 0.3],
            state_max=[0.9, 0.8],
        ),
        actions_config=ActionsConfig(limit_action_change=False, max_change_action_norm=[0.1, 0.2]),
        model_config=ModelConfig(
            gp_init={
                "noise_covar.noise": [1e-5, 1e-5],
                "base_kernel.lengthscale": [0.25, 0.25],
                "outputscale": [5e-2, 5e-2],
            },
            min_lengthscale=5e-2,
            include_time_model=True,
        ),
        memory_config=MemoryConfig(
            min_error_prediction_state_for_memory=[1e-5, 1e-5],
            min_prediction_state_std_for_memory=[3e-3, 3e-3],
            points_batch_memory=32,
        ),
        training_config=TrainingConfig(iter_train=1, training_frequency=1000),
        controller_config=ControllerConfig(
            len_horizon=3,
            actions_optimizer_params={"maxiter": 2, "maxcor": 3, "maxls": 3},
            num_repeat_actions=2,
        ),
    )
    spec, params0 = episode_spec_from_config(env, cfg, num_steps=16, warmup=6, cap=32)
    fn = build_episode_fn(spec)
    out = fn(jax.random.PRNGKey(2), params0)
    assert np.all(np.isfinite(np.asarray(out["cost"])))
