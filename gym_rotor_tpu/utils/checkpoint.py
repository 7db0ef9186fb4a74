"""Checkpointing.

Two tiers (SURVEY.md §5 "checkpoint/resume"):

* ``save_actor``/``load_actor`` — reference-compatible behavior: persist only
  the actor weights under the reference's filename scheme
  ``{algo}_{framework}_{steps/1000}k_steps_agent_{id}_{seed}`` (reference
  td3.py:216-238), serialized with flax msgpack instead of torch pickles.
* ``save_train_state``/``load_train_state`` — full-fidelity training
  checkpoint (params + optimizer states + replay cursor + RNG + env step
  counters) that the reference lacks; enables true resume.
"""
from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


def _actor_path(model_dir, rl_algo, framework, total_steps, agent_id, seed,
                solved=False):
    tag = "_solved" if solved else ""
    return os.path.join(
        model_dir,
        f"{rl_algo}_{framework}_{total_steps / 1000}k_steps_agent_"
        f"{agent_id}{tag}_{seed}.msgpack",
    )


def save_actor(model_dir, actor_params, rl_algo, framework, total_steps,
               agent_id, seed, solved=False) -> str:
    os.makedirs(model_dir, exist_ok=True)
    path = _actor_path(model_dir, rl_algo, framework, total_steps, agent_id,
                       seed, solved)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(actor_params))
    return path


def load_actor(path, template_params):
    with open(path, "rb") as f:
        return serialization.from_bytes(template_params, f.read())


def save_train_state(path: str, state: Any) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    return path


def load_train_state(path: str, template: Any):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
