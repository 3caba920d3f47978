from .run_env import run_env, run_env_multiple

__all__ = ["run_env", "run_env_multiple"]
