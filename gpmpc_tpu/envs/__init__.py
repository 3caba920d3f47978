from .base import Box, EnvBase
from .pendulum import PendulumEnv
from .mountain_car import MountainCarContinuousEnv
from .process_control import ProcessControl

__all__ = ["Box", "EnvBase", "MountainCarContinuousEnv", "PendulumEnv", "ProcessControl"]
