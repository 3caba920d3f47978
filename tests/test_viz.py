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
