"""Cross-path equivalence: host GpMpcController loop vs fused on-device episode.

VERDICT r1 item 7: same config, same (deterministic) seed protocol,
include_time_model on and off with num_repeat_actions > 1 — the two paths'
chosen actions and stored memories must agree step for step. Randomness is
removed on both sides (EpisodeSpec.deterministic_inits on the fused path, a
constant-0.5 rng stub on the host path); the pendulum dynamics are
deterministic, so the trajectories coincide when the actions do.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpmpc_tpu.controllers.controller import GpMpcController
from gpmpc_tpu.envs.jax_dynamics import pendulum_spec
from gpmpc_tpu.runner.jit_episode import build_episode_fn, episode_spec_from_config, memory_prepare
from tests.test_controller_integration import small_pendulum_config


class _ConstRng:
    """Stand-in for the controller's np rng: every uniform draw is 0.5 —
    mirrors EpisodeSpec.deterministic_inits on the fused path."""

    def uniform(self, size=None):
        if size is None:
            return 0.5
        return np.full(size, 0.5)


def _compare_paths(include_time_model: bool, nrep: int, num_steps: int = 12):
    cfg = small_pendulum_config()
    cfg.model.include_time_model = include_time_model
    cfg.controller.num_repeat_actions = nrep
    cfg.training.training_frequency = 10**6  # training off: keeps both paths rng-free
    cfg.memory.check_errors_for_storage = True  # exercise the storage filter cross-path

    env = pendulum_spec()
    spec, params0 = episode_spec_from_config(
        env, cfg, num_steps=num_steps, warmup=0, cap=32, deterministic_inits=True
    )
    fn = build_episode_fn(spec)
    out = fn(jax.random.PRNGKey(0), params0)
    obs_seq = np.asarray(out["obs"])  # (T, Ns) — obs BEFORE each step
    act_seq = np.asarray(out["action_raw"])  # (T, Na)
    obs_next = np.concatenate([obs_seq[1:], np.asarray(out["final_obs"])[None]], axis=0)

    ctrl = GpMpcController(
        observation_low=np.asarray(env.obs_low),
        observation_high=np.asarray(env.obs_high),
        action_low=np.asarray(env.act_low),
        action_high=np.asarray(env.act_high),
        config=cfg,
        seed=0,
    )
    ctrl._rng = _ConstRng()

    for t in range(num_steps):
        # force a full refactorization every planning step so the host path
        # runs bitwise-identical math to the fused path (no O(N^2) extends)
        ctrl.planner.invalidate_cache()
        a = ctrl.get_action(obs_mu=obs_seq[t])
        info = ctrl.get_iter_info()
        np.testing.assert_allclose(
            np.asarray(a), act_seq[t], atol=1e-8,
            err_msg=f"action diverged at step {t} (time_model={include_time_model}, nrep={nrep})",
        )
        ctrl.add_memory(
            obs=obs_seq[t],
            action=act_seq[t],  # feed the (identical) fused action to stay on its trajectory
            obs_new=obs_next[t],
            reward=0.0,
            predicted_state=info.predicted_states[1],
            predicted_state_std=info.predicted_states_std[1],
        )

    # memories: bring both to the same processing watermark, then compare
    ctrl.memory.prepare_for_model()
    hx, hy = ctrl.memory.get()
    fmem = memory_prepare(out["final_mem"], nrep, len(env.obs_low))
    n_dev = int(fmem.len_model)
    assert n_dev == len(hx), f"model-set size: device {n_dev} vs host {len(hx)}"
    np.testing.assert_allclose(np.asarray(fmem.model_inputs[:n_dev]), hx, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fmem.model_targets[:n_dev]), hy, atol=1e-8)
    if include_time_model:
        # time column is the env step index in BOTH paths (host stores
        # iter_ctrl - 1, controller.py; fused stores t, jit_episode.py)
        expected_t = np.arange(0, n_dev * nrep, nrep, dtype=float)
        stored_t = hx[:, -1]
        # rows are stride-aligned but may skip filtered-out points; check
        # each stored time is a multiple of nrep and matches the device twin
        assert np.all(stored_t % nrep == 0)
        np.testing.assert_allclose(np.asarray(fmem.model_inputs[:n_dev, -1]), stored_t, atol=0)
        del expected_t


@pytest.mark.slow
def test_cross_path_time_model_with_action_repeat():
    _compare_paths(include_time_model=True, nrep=2)


@pytest.mark.slow
def test_cross_path_no_time_model():
    _compare_paths(include_time_model=False, nrep=1)


@pytest.mark.slow
def test_cross_path_with_training():
    """VERDICT r2 item 5: cross-path equivalence WITH MLL training enabled.

    The two paths share the deterministic training-key protocol
    (fold_in(fold_in(PRNGKey(seed), TRAIN_KEY_TAG), t + 1) — see
    controllers/controller.py and runner/jit_episode.py), so with the same
    seed the hyperparameter hot-swaps must produce identical params, and
    actions must stay identical THROUGH the swaps. training_frequency=5 is
    deliberately misaligned with nrep=2. The host integration is forced
    synchronous in the test (block + check) to pin the swap to the same
    step the fused path swaps on; the async discipline itself is covered by
    tests/test_controller_integration.py.
    """
    import jax as _jax

    nrep, num_steps, freq = 2, 12, 5
    cfg = small_pendulum_config()
    cfg.controller.num_repeat_actions = nrep
    cfg.training.training_frequency = freq
    cfg.training.iter_train = 2  # keep the on-CPU MLL budget small
    cfg.memory.check_errors_for_storage = True

    env = pendulum_spec()
    spec, params0 = episode_spec_from_config(
        env, cfg, num_steps=num_steps, warmup=0, cap=32, deterministic_inits=True
    )
    fn = build_episode_fn(spec)
    out = fn(jax.random.PRNGKey(0), params0)
    obs_seq = np.asarray(out["obs"])
    act_seq = np.asarray(out["action_raw"])
    obs_next = np.concatenate([obs_seq[1:], np.asarray(out["final_obs"])[None]], axis=0)

    ctrl = GpMpcController(
        observation_low=np.asarray(env.obs_low),
        observation_high=np.asarray(env.obs_high),
        action_low=np.asarray(env.act_low),
        action_high=np.asarray(env.act_high),
        config=cfg,
        seed=0,
    )
    ctrl._rng = _ConstRng()

    swaps = 0
    for t in range(num_steps):
        ctrl.planner.invalidate_cache()
        a = ctrl.get_action(obs_mu=obs_seq[t])
        info = ctrl.get_iter_info()
        np.testing.assert_allclose(
            np.asarray(a), act_seq[t], atol=1e-8,
            err_msg=f"action diverged at step {t} (training at t+1 in {freq, 2 * freq})",
        )
        ctrl.add_memory(
            obs=obs_seq[t], action=act_seq[t], obs_new=obs_next[t], reward=0.0,
            predicted_state=info.predicted_states[1],
            predicted_state_std=info.predicted_states_std[1],
        )
        if ctrl._pending_train is not None:
            _jax.block_until_ready(ctrl._pending_train)
            ctrl.check_and_close_processes()
            assert ctrl._pending_train is None
            assert (t + 1) % freq == 0, f"training fired at unexpected step {t}"
            swaps += 1
    assert swaps == num_steps // freq, f"expected {num_steps // freq} swaps, got {swaps}"

    # post-swap hyperparameters must agree across paths
    fin = out["final_params"]
    for hp, dp in zip(jax.tree_util.tree_leaves(ctrl.gp_params), jax.tree_util.tree_leaves(fin)):
        np.testing.assert_allclose(np.asarray(hp), np.asarray(dp), atol=1e-8)

    # memories too (same watermark protocol as the no-training tests)
    ctrl.memory.prepare_for_model()
    hx, hy = ctrl.memory.get()
    fmem = memory_prepare(out["final_mem"], nrep, len(env.obs_low))
    n_dev = int(fmem.len_model)
    assert n_dev == len(hx)
    np.testing.assert_allclose(np.asarray(fmem.model_inputs[:n_dev]), hx, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fmem.model_targets[:n_dev]), hy, atol=1e-8)
