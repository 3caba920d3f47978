"""Smoke tests for the visualization stack (headless Agg backend).

The reference's de-facto assertions are its plots (SURVEY.md §4); here the
plots are exercised in CI: a short pendulum episode with full visualization
must produce the 2D history PNG and the 3D model PNG in the timestamped run
folder (reference visu_objects/utils.py:13-19 layout) without a display.
"""

import glob
import os

import matplotlib

matplotlib.use("Agg")

import numpy as np

from gpmpc_tpu import VisuConfig
from gpmpc_tpu.envs import PendulumEnv
from gpmpc_tpu.runner.run_env import run_env

from tests.test_controller_integration import small_pendulum_config


def test_visualizations_write_artifacts(tmp_path):
    cfg = small_pendulum_config(len_horizon=3)
    visu = VisuConfig(
        render_live_plot_2d=False,
        render_env=False,
        save_render_env=False,
        save_live_plot_2d=False,
        folder_save=str(tmp_path),
    )
    costs = run_env(PendulumEnv(seed=0), cfg, visu, random_actions_init=4, num_steps=8, verbose=False)
    assert len(costs) == 8

    pngs = glob.glob(os.path.join(str(tmp_path), "**", "*.png"), recursive=True)
    names = sorted(os.path.basename(p) for p in pngs)
    assert any("history" in n or "2d" in n for n in names), names
    assert any("model" in n or "3d" in n for n in names), names
    for p in pngs:
        assert os.path.getsize(p) > 1000  # non-empty render


def test_env_video_capture(tmp_path):
    """save_render_env must produce a non-trivial video artifact
    (reference records mp4 per run, visu_object.py:56)."""
    cfg = small_pendulum_config(len_horizon=3)
    visu = VisuConfig(
        render_live_plot_2d=False,
        render_env=False,
        save_render_env=True,
        save_live_plot_2d=False,
        folder_save=str(tmp_path),
    )
    run_env(PendulumEnv(seed=0), cfg, visu, random_actions_init=4, num_steps=6, verbose=False)
    vids = glob.glob(os.path.join(str(tmp_path), "**", "render_env.*"), recursive=True)
    assert vids, "no env video written"
    assert os.path.getsize(vids[0]) > 2000


def test_env_render_rgb_arrays():
    """All built-in envs render non-degenerate rgb frames."""
    from gpmpc_tpu.envs import MountainCarContinuousEnv, ProcessControl

    for env in (PendulumEnv(seed=0), MountainCarContinuousEnv(seed=0), ProcessControl(seed=0)):
        env.reset()
        frame = env.render(mode="rgb_array")
        assert frame is not None and frame.ndim == 3 and frame.shape[2] == 3
        assert frame.std() > 1.0  # not a constant image
        assert env.render(mode="human") is None


def test_3d_plot_has_memory_overlays(tmp_path):
    """The 3D model plot renders with stored/filtered scatter, error scatter
    and trajectory quivers (reference static_3d_graph.py:96-136) — exercised
    with a storage filter that actually rejects some points."""
    from gpmpc_tpu.controllers.controller import GpMpcController
    from gpmpc_tpu.viz.static_3d import save_plot_model_3d

    env = PendulumEnv(seed=0)
    cfg = small_pendulum_config(len_horizon=3)
    cfg.memory.check_errors_for_storage = True
    ctrl = GpMpcController(
        env.observation_space.low, env.observation_space.high,
        env.action_space.low, env.action_space.high, cfg, seed=0,
    )
    obs = env.reset()
    rng = np.random.default_rng(0)
    for t in range(14):
        a = ctrl.get_action(obs_mu=obs, random=True)
        info = ctrl.get_iter_info()
        obs_new, r, done, _ = env.step(a)
        ctrl.add_memory(obs, a, obs_new, r,
                        predicted_state=info.predicted_states[1],
                        predicted_state_std=info.predicted_states_std[1])
        obs = obs_new
    ctrl.memory.prepare_for_model()
    path = save_plot_model_3d(ctrl, folder_save=str(tmp_path))
    assert path and os.path.getsize(path) > 10_000
