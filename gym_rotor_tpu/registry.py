"""Environment registry.

The reference registers ``Quad-v0`` with gymnasium
(gym_rotor/__init__.py:3-7); wrappers are subclasses instantiated directly.
Here a tiny framework-local registry maps ids to classful env constructors
(the functional core needs no registry — it is addressed by Config.task).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

_REGISTRY: Dict[str, Callable] = {}


def register(env_id: str, entry_point: Callable, **default_kwargs):
    _REGISTRY[env_id] = (entry_point, default_kwargs)


def make(env_id: str, **kwargs):
    if env_id not in _REGISTRY:
        _ensure_builtin()
    if env_id not in _REGISTRY:
        raise KeyError(
            f"Unknown env id {env_id!r}; known: {sorted(_REGISTRY)}"
        )
    entry, defaults = _REGISTRY[env_id]
    merged = {**defaults, **kwargs}
    return entry(**merged)


def _ensure_builtin():
    from .envs.gym_api import QuadEnv, CoupledWrapper, DecoupledWrapper

    # max_episode_steps=10000 matches reference gym_rotor/__init__.py:6.
    if "Quad-v0" not in _REGISTRY:
        register("Quad-v0", QuadEnv, max_episode_steps=10000)
        register("Coupled-v0", CoupledWrapper, max_episode_steps=10000)
        register("Decoupled-v0", DecoupledWrapper, max_episode_steps=10000)
