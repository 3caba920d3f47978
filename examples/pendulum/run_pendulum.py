import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.."))

from config_pendulum import get_config

from gpmpc_tpu import VisuConfig, run_env
from gpmpc_tpu.envs import PendulumEnv


def run_pendulum(num_steps=150, random_actions_init=10, num_repeat_actions=1, len_horizon=15, verbose=True):
    env = PendulumEnv(seed=0)
    control_config = get_config(len_horizon=len_horizon, num_repeat_actions=num_repeat_actions)
    visu_config = VisuConfig(render_live_plot_2d=False, render_env=False)
    return run_env(
        env, control_config, visu_config, random_actions_init=random_actions_init, num_steps=num_steps, verbose=verbose
    )


if __name__ == "__main__":
    costs = run_pendulum()
    print(f"final mean cost over last 50 steps: {sum(costs[-50:]) / 50:.4f}")
