import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.."))

from config_pendulum import get_config

from gpmpc_tpu import VisuConfig, run_env_multiple
from gpmpc_tpu.envs import PendulumEnv

if __name__ == "__main__":
    num_runs = 20
    env = PendulumEnv(seed=0)
    control_config = get_config(len_horizon=12, num_repeat_actions=1)
    visu_config = None
    run_env_multiple(
        env, "Pendulum-v0", control_config, visu_config, num_runs, random_actions_init=10, num_steps=300, verbose=False
    )
