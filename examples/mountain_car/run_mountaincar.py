import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.."))

from config_mountaincar import get_config

from gpmpc_tpu import VisuConfig, run_env
from gpmpc_tpu.envs import MountainCarContinuousEnv


def run_mountain_car(num_steps=500, random_actions_init=20, num_repeat_actions=5, len_horizon=12, verbose=True):
    env = MountainCarContinuousEnv(seed=0)
    control_config = get_config(len_horizon=len_horizon, num_repeat_actions=num_repeat_actions)
    visu_config = VisuConfig(render_live_plot_2d=False, render_env=False)
    return run_env(
        env, control_config, visu_config, random_actions_init=random_actions_init, num_steps=num_steps, verbose=verbose
    )


if __name__ == "__main__":
    costs = run_mountain_car()
