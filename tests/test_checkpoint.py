"""Checkpoint/resume: a restored controller reproduces the original's actions."""

import numpy as np

from gpmpc_tpu import GpMpcController
from gpmpc_tpu.envs import PendulumEnv
from tests.test_controller_integration import small_pendulum_config


def _run_steps(ctrl, env, obs, n, start_random=0):
    traj = []
    for i in range(n):
        a = ctrl.get_action(obs, random=i < start_random)
        info = ctrl.get_iter_info()
        obs_new, r, d, _ = env.step(a)
        ctrl.add_memory(obs, a, obs_new, r, info.predicted_states[1], info.predicted_states_std[1])
        obs = obs_new
        traj.append(a.copy())
    return obs, traj


def test_checkpoint_roundtrip_reproduces_actions(tmp_path):
    cfg = small_pendulum_config()
    cfg.training.training_frequency = 1000  # keep params static for determinism
    env = PendulumEnv(seed=11)
    ctrl = GpMpcController(
        env.observation_space.low, env.observation_space.high, env.action_space.low, env.action_space.high, cfg, seed=3
    )
    obs0 = env.reset()
    obs, _ = _run_steps(ctrl, env, obs0, 8, start_random=4)

    path = str(tmp_path / "ckpt.npz")
    ctrl.save_checkpoint(path)
    env_state_snapshot = env.state.copy()

    # continue original
    env.state = env_state_snapshot.copy()
    obs_a, traj_a = _run_steps(ctrl, env, obs.copy(), 3)

    # restore into a FRESH controller and replay from the same point
    env2 = PendulumEnv(seed=11)
    env2.reset()
    env2.state = env_state_snapshot.copy()
    ctrl2 = GpMpcController(
        env2.observation_space.low, env2.observation_space.high, env2.action_space.low, env2.action_space.high, cfg, seed=3
    )
    ctrl2.restore_checkpoint(path)

    # same memory and params
    np.testing.assert_allclose(np.asarray(ctrl2.gp_params.raw_lengthscales), np.asarray(ctrl.gp_params.raw_lengthscales))
    assert ctrl2.memory.len_mem == 8
    assert ctrl2.iter_ctrl == 8

    obs_b, traj_b = _run_steps(ctrl2, env2, obs.copy(), 3)
    # identical rng stream + identical state -> identical actions
    for a, b in zip(traj_a, traj_b):
        np.testing.assert_allclose(a, b, atol=1e-10)
