"""Equivariant model zoo: the 18 EMLP model classes of the reference
(algos/td3/td3_emlp.py, algos/sac/sac_emlp.py, algos/ppo/ppo_emlp.py)
expressed as parametrized flax modules over the rep algebra.

Group representations (file:line citations at each builder):
  MONO:   in = 6 V(SO2eR3) + 2 Scalar + V(Trivial3),  out = Scalar + V(Trivial3)
  MODUL1: in = 5 V(SO2eR3),                           out = Scalar + V(SO2eR3)
  MODUL2: in = 3 V(Mirror(1)),                        out = V(Mirror(1))
with critics appending the action reps and CTDE critics concatenating both
agents' reps.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...algos.td3 import ModelDefs
from ...models import mlp
from ...utils.config import Config
from . import groups as G
from .nn import (EMLP, EMLPBlock, EquivLinear, fast_twin, make_fold_fn,
                 spectral_weights)
from .reps import Scalar, SumRep, Vector, uniform_rep

LOG_SIG_MAX, LOG_SIG_MIN = 2.0, -20.0


# ----------------------------------------------------------------------------
# Rep builders
# ----------------------------------------------------------------------------
def _groups():
    return G.SO2eR3(), G.Trivial(1), G.Trivial(3), G.Mirror(1)


def actor_reps(cfg: Config, framework: str, agent_id: int):
    """(rep_in, hidden_rep, rep_out, hidden_group) per actor."""
    so2, t1, t3, mir = _groups()
    ah = cfg.actor_hidden_dim[agent_id]
    if framework == "MONO":
        rep_in = Vector(so2) * 6 + Scalar(t1) * 2 + Vector(t3)  # td3_emlp.py:38
        rep_out = Scalar(t1) + Vector(t3)                       # td3_emlp.py:40
        hidden = uniform_rep(ah, so2)                           # td3_emlp.py:43
    elif agent_id == 0:  # MODUL1
        rep_in = Vector(so2) * 5                                # td3_emlp.py:161
        rep_out = Scalar(t1) + Vector(so2)                      # td3_emlp.py:163
        hidden = uniform_rep(ah, so2)
    else:  # MODUL2
        rep_in = Vector(mir) * 3                                # td3_emlp.py:215
        rep_out = Vector(mir)                                   # td3_emlp.py:217
        hidden = uniform_rep(ah, mir)                           # td3_emlp.py:220
    return rep_in, hidden, rep_out


def critic_reps(cfg: Config, framework: str, agent_id: int,
                module_training: str):
    """(rep_in, hidden_rep, rep_out) for Q critics (obs + action input)."""
    so2, t1, t3, mir = _groups()
    ch = cfg.critic_hidden_dim
    if framework == "MONO":
        rep_in = (Vector(so2) * 6 + Scalar(t1) * 2 + Vector(t3)
                  + Scalar(t1) + Vector(t3))                    # td3_emlp.py:95-96
        hidden = uniform_rep(ch, so2)                           # td3_emlp.py:101
    elif module_training == "CTDE":
        rep_in = (Vector(so2) * 5 + Vector(mir) * 3
                  + Scalar(t1) + Vector(so2) + Vector(mir))     # td3_emlp.py:272-273
        hidden = uniform_rep(ch, so2 if agent_id == 0 else mir)  # :278, :346
    elif agent_id == 0:  # MODUL1 DTDE
        rep_in = Vector(so2) * 5 + Scalar(t1) + Vector(so2)     # td3_emlp.py:406
        hidden = uniform_rep(ch, so2)                           # td3_emlp.py:411
    else:  # MODUL2 DTDE
        rep_in = Vector(mir) * 4                                # td3_emlp.py:468
        hidden = uniform_rep(ch, mir)
    return rep_in, hidden, Scalar(t1)


def v_critic_reps(cfg: Config, framework: str, agent_id: int,
                  module_training: str):
    """(rep_in, hidden_rep, rep_out) for PPO V(s) critics (obs only)."""
    so2, t1, t3, mir = _groups()
    ch = cfg.critic_hidden_dim
    if framework == "MONO":
        rep_in = Vector(so2) * 6 + Scalar(t1) * 2 + Vector(t3)  # ppo_emlp.py:121
        hidden = uniform_rep(ch, so2)
    elif module_training == "CTDE":
        rep_in = Vector(so2) * 5 + Vector(mir) * 3              # ppo_emlp.py:349,414
        hidden = uniform_rep(ch, so2 if agent_id == 0 else mir)
    elif agent_id == 0:
        rep_in = Vector(so2) * 5                                # ppo_emlp.py:471
        hidden = uniform_rep(ch, so2)
    else:
        rep_in = Vector(mir) * 3                                # ppo_emlp.py:526
        hidden = uniform_rep(ch, mir)
    return rep_in, hidden, Scalar(t1)


# ----------------------------------------------------------------------------
# Modules
# ----------------------------------------------------------------------------
class EMLPActorDet(nn.Module):
    """Deterministic tanh EMLP actor (td3_emlp.py:14-68)."""
    rep_in: SumRep
    hidden: SumRep
    rep_out: SumRep
    hidden_num: int = 2
    project: bool = True

    @nn.compact
    def __call__(self, obs):
        reps = (self.rep_in,) + (self.hidden,) * self.hidden_num
        return jnp.tanh(EMLP(reps, self.rep_out, name="network",
                             project=self.project)(obs))


class EMLPCriticTwin(nn.Module):
    """Twin equivariant Q networks over concat(obs, act)
    (td3_emlp.py:71-137)."""
    rep_in: SumRep
    hidden: SumRep
    rep_out: SumRep
    hidden_num: int = 2
    project: bool = True

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        reps = (self.rep_in,) + (self.hidden,) * self.hidden_num
        q1 = EMLP(reps, self.rep_out, name="network1",
                  project=self.project)(x)
        q2 = EMLP(reps, self.rep_out, name="network2",
                  project=self.project)(x)
        return q1, q2

    def q1(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        reps = (self.rep_in,) + (self.hidden,) * self.hidden_num
        return EMLP(reps, self.rep_out, name="network1",
                    project=self.project)(x)


class EMLPCriticSingle(nn.Module):
    """ONE equivariant Q network with EMLPCriticTwin's architecture, applied
    to param subtrees from ``emlp_twin_split`` — the vehicle for evaluating
    several (params, input) twin-critic combinations as one vmapped forward
    (algos/td3.py stacked critic path)."""
    rep_in: SumRep
    hidden: SumRep
    rep_out: SumRep
    hidden_num: int = 2
    project: bool = True

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        reps = (self.rep_in,) + (self.hidden,) * self.hidden_num
        return EMLP(reps, self.rep_out, name="network",
                    project=self.project)(x)


def emlp_twin_split(params):
    """Twin param tree -> (net1 params, net2 params) for EMLPCriticSingle.
    Pure relabeling (no copies under jit)."""
    p = params["params"] if "params" in params else params
    return ({"params": {"network": p["network1"]}},
            {"params": {"network": p["network2"]}})


class EMLPActorSAC(nn.Module):
    """Gaussian EMLP actor: equivariant trunk + mean head; the log_std head
    is a plain Dense tapping the last hidden layer (sac_emlp.py:57-86)."""
    rep_in: SumRep
    hidden: SumRep
    rep_out: SumRep
    action_dim: int
    hidden_num: int = 2
    project: bool = True

    @nn.compact
    def __call__(self, obs):
        x = obs
        reps = (self.rep_in,) + (self.hidden,) * self.hidden_num
        for i, (rin, rout) in enumerate(zip(reps, reps[1:])):
            x = EMLPBlock(rin, rout, name=f"network_block{i}",
                          project=self.project)(x)
        mean = EquivLinear(reps[-1], self.rep_out, name="network_head",
                           project=self.project)(x)
        log_std = nn.Dense(self.action_dim, name="log_std_linear")(x)
        log_std = jnp.clip(log_std, LOG_SIG_MIN, LOG_SIG_MAX)
        return mean, log_std


class EMLPActorPPO(nn.Module):
    """PPO EMLP actor: tanh mean + learnable state-independent log_std
    (ppo_emlp.py:16-86)."""
    rep_in: SumRep
    hidden: SumRep
    rep_out: SumRep
    action_dim: int
    hidden_num: int = 2
    log_std_init: float = 0.0
    project: bool = True

    @nn.compact
    def __call__(self, obs):
        reps = (self.rep_in,) + (self.hidden,) * self.hidden_num
        mean = jnp.tanh(EMLP(reps, self.rep_out, name="network",
                             project=self.project)(obs))
        log_std = self.param(
            "log_std",
            lambda k, s: jnp.full(s, self.log_std_init, jnp.float32),
            (1, self.action_dim))
        return mean, jnp.broadcast_to(log_std, mean.shape)


class EMLPVCritic(nn.Module):
    """Equivariant V(s) critic (ppo_emlp.py:104-142)."""
    rep_in: SumRep
    hidden: SumRep
    rep_out: SumRep
    hidden_num: int = 2
    project: bool = True

    @nn.compact
    def __call__(self, obs):
        reps = (self.rep_in,) + (self.hidden,) * self.hidden_num
        return EMLP(reps, self.rep_out, name="network",
                    project=self.project)(obs)


# ----------------------------------------------------------------------------
# Factories (ModelDefs used by the algos)
# ----------------------------------------------------------------------------
def _with_fold(actor_def, critic_def, a_in, c_in, critic_is_q=True):
    """Populate ModelDefs with the project=False twins + fold fns.

    The fold tracer only needs inputs whose concatenation matches rep_in
    (the param tree is shape-determined by the reps alone), so the Q-critic
    sample splits rep_in.size as (size-1, 1)."""
    a_obs = jnp.zeros((1, a_in.size), jnp.float32)
    if critic_is_q:
        c_args = (jnp.zeros((1, c_in.size - 1), jnp.float32),
                  jnp.zeros((1, 1), jnp.float32))
    else:
        c_args = (jnp.zeros((1, c_in.size), jnp.float32),)
    return dict(
        actor_def=actor_def, critic_def=critic_def,
        actor_spectral=spectral_weights, critic_spectral=spectral_weights,
        actor_fast=fast_twin(actor_def), critic_fast=fast_twin(critic_def),
        actor_fold=make_fold_fn(actor_def, a_obs),
        critic_fold=make_fold_fn(critic_def, *c_args),
    )


def _q_single(c_in, c_hid, c_out):
    single = EMLPCriticSingle(c_in, c_hid, c_out)
    return dict(critic_single=single, critic_single_fast=fast_twin(single),
                critic_split=emlp_twin_split)


def td3_models(cfg: Config, agent_id: int) -> ModelDefs:
    a_in, a_hid, a_out = actor_reps(cfg, cfg.framework, agent_id)
    c_in, c_hid, c_out = critic_reps(cfg, cfg.framework, agent_id,
                                     cfg.module_training)
    return ModelDefs(**_with_fold(
        EMLPActorDet(a_in, a_hid, a_out),
        EMLPCriticTwin(c_in, c_hid, c_out), a_in, c_in),
        **_q_single(c_in, c_hid, c_out))


def sac_models(cfg: Config, agent_id: int) -> ModelDefs:
    a_in, a_hid, a_out = actor_reps(cfg, cfg.framework, agent_id)
    c_in, c_hid, c_out = critic_reps(cfg, cfg.framework, agent_id,
                                     cfg.module_training)
    return ModelDefs(**_with_fold(
        EMLPActorSAC(a_in, a_hid, a_out, cfg.action_dim_n[agent_id]),
        EMLPCriticTwin(c_in, c_hid, c_out), a_in, c_in),
        **_q_single(c_in, c_hid, c_out))


def ppo_models(cfg: Config, agent_id: int) -> ModelDefs:
    a_in, a_hid, a_out = actor_reps(cfg, cfg.framework, agent_id)
    c_in, c_hid, c_out = v_critic_reps(cfg, cfg.framework, agent_id,
                                       cfg.module_training)
    return ModelDefs(**_with_fold(
        EMLPActorPPO(a_in, a_hid, a_out, cfg.action_dim_n[agent_id]),
        EMLPVCritic(c_in, c_hid, c_out), a_in, c_in, critic_is_q=False))
