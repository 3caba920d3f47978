import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.."))

from config_mountaincar import get_config

from gpmpc_tpu import run_env_multiple
from gpmpc_tpu.envs import MountainCarContinuousEnv

if __name__ == "__main__":
    env = MountainCarContinuousEnv(seed=0)
    control_config = get_config(len_horizon=12, num_repeat_actions=5)
    run_env_multiple(
        env, "MountainCarContinuous-v0", control_config, None, num_runs=10,
        random_actions_init=20, num_steps=500, verbose=False,
    )
