from .observation import ObservationNormalizer
from .action import ActionMapperSpec, mpc_to_model_actions, norm_action, denorm_action
from .reward import RewardSpec, reward_single, reward_terminal, rewards_trajectory

__all__ = [
    "ActionMapperSpec",
    "ObservationNormalizer",
    "RewardSpec",
    "denorm_action",
    "mpc_to_model_actions",
    "norm_action",
    "reward_single",
    "reward_terminal",
    "rewards_trajectory",
]
