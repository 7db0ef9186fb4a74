"""gym_rotor_tpu — a TPU-native quadrotor RL environment engine + learner.

A from-scratch JAX/XLA re-design with the capabilities of the reference
``gym-rotor`` package (see SURVEY.md): SO(3) rigid-body quadrotor dynamics,
MONO/MODUL task wrappers, trajectory generation, TD3/SAC/PPO (+ equivariant
EMLP models), driven either through a pure-functional batched API
(vmap/scan/pjit over thousands of envs) or a gymnasium-style classful API.
"""
from .version import __version__
from .utils.config import Config, config_from_args
from .registry import make, register

__all__ = ["__version__", "Config", "config_from_args", "make", "register"]
