from .jit_episode import (
    EpisodeSpec,
    build_episode_fn,
    episode_spec_from_config,
    build_episodes_batch_fn,
    run_episodes_batch,
)
from .run_env import run_env, run_env_multiple

__all__ = [
    "EpisodeSpec",
    "build_episode_fn",
    "episode_spec_from_config",
    "run_env",
    "run_env_multiple",
    "build_episodes_batch_fn",
    "run_episodes_batch",
]
