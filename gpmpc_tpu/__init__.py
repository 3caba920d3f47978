"""gpmpc_tpu — TPU-native GP-MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SimonRennotte/Data-Efficient-Reinforcement-Learning-with-Probabilistic-Model-Predictive-Control
(reference layout documented in SURVEY.md). The compute path — ARD-RBF Gram
construction, Cholesky factorization, PILCO moment-matched uncertainty rollout,
quadratic-cost evaluation, box-constrained L-BFGS action optimization, and
marginal-log-likelihood hyperparameter training — runs fully on device inside a
handful of jitted functions; the host only steps the environment and records
iteration info.

Public surface mirrors the reference package root (rl_gp_mpc/__init__.py:1-2)
plus the runner functions (rl_gp_mpc/run_env_function.py:14,52).
"""

import os

# Double precision is required for parity with the reference, which sets
# torch.set_default_tensor_type(torch.DoubleTensor) at config import time
# (reference total_config.py:11). x64 must be enabled before any array is
# created; opt out with GPMPC_TPU_X64=0 for the f32 fast path.
if os.environ.get("GPMPC_TPU_X64", "1") != "0":
    import jax

    jax.config.update("jax_enable_x64", True)

from .config import (  # noqa: E402
    ActionsConfig,
    Config,
    ControllerConfig,
    MemoryConfig,
    ModelConfig,
    ObservationConfig,
    RewardConfig,
    TrainingConfig,
    VisuConfig,
)
from .controllers.controller import GpMpcController, IterationInformation  # noqa: E402
from .runner.run_env import run_env, run_env_multiple  # noqa: E402
from .viz.visu import ControlVisualizations  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "ActionsConfig",
    "Config",
    "ControllerConfig",
    "ControlVisualizations",
    "GpMpcController",
    "IterationInformation",
    "MemoryConfig",
    "ModelConfig",
    "ObservationConfig",
    "RewardConfig",
    "TrainingConfig",
    "VisuConfig",
    "run_env",
    "run_env_multiple",
]
