"""Time-varying dynamics demo: include_time_model=True + params changing
every 500 steps (mirrors reference run_processc_control_multiple.py:19,30)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "../.."))

from config_process_control import get_config

from gpmpc_tpu import run_env_multiple
from gpmpc_tpu.envs import ProcessControl

if __name__ == "__main__":
    env = ProcessControl(
        dt=1,
        s_range=(20, 30),
        fi_range=(0.2, 0.3),
        ci_range=(0.1, 0.2),
        cr_range=(0.9, 1.0),
        noise_l_prop_range=(3e-3, 1e-2),
        noise_co_prop_range=(3e-3, 1e-2),
        sp_l_range=(0.4, 0.6),
        sp_co_range=(0.4, 0.6),
        change_params=True,
        period_change=500,
        seed=0,
    )
    control_config = get_config(len_horizon=5, include_time_model=True, num_repeat_actions=10)
    run_env_multiple(
        env, "process_control", control_config, None, num_runs=10,
        random_actions_init=10, num_steps=1000, verbose=False,
    )
