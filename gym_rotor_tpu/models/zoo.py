"""Model factory: maps (algo, framework, agent_id, use_equiv) to the model
definitions the reference instantiates in its algorithm constructors
(td3.py:34-68, sac.py:36-70, ppo.py:34-68).

18 reference model classes collapse to a few parametrized definitions here:
MLP actors/critics (models/mlp.py) and equivariant EMLP actors/critics
(models/emlp/) selected by ``cfg.use_equiv``; the MODUL1/MODUL2 distinction
is carried by per-agent dims and (for EMLP) per-agent group representations.
"""
from __future__ import annotations

from ..algos.td3 import ModelDefs
from ..utils.config import Config
from . import mlp


def _dims(cfg: Config, agent_id: int):
    return (cfg.obs_dim_n[agent_id], cfg.action_dim_n[agent_id],
            cfg.actor_hidden_dim[agent_id], cfg.critic_hidden_dim)


def _mlp_q_single(ch):
    return dict(critic_single=mlp.CriticSingle(hidden_dim=ch),
                critic_single_fast=mlp.CriticSingle(hidden_dim=ch),
                critic_split=mlp.critic_twin_split)


def td3_models(cfg: Config, agent_id: int) -> ModelDefs:
    obs_dim, act_dim, ah, ch = _dims(cfg, agent_id)
    if cfg.use_equiv:
        from .emlp import zoo as ezoo
        return ezoo.td3_models(cfg, agent_id)
    return ModelDefs(
        actor_def=mlp.ActorTD3(hidden_dim=ah, action_dim=act_dim),
        critic_def=mlp.CriticTwin(hidden_dim=ch),
        **_mlp_q_single(ch),
    )


def sac_models(cfg: Config, agent_id: int) -> ModelDefs:
    obs_dim, act_dim, ah, ch = _dims(cfg, agent_id)
    if cfg.use_equiv:
        from .emlp import zoo as ezoo
        return ezoo.sac_models(cfg, agent_id)
    return ModelDefs(
        actor_def=mlp.ActorSAC(hidden_dim=ah, action_dim=act_dim),
        critic_def=mlp.CriticTwin(hidden_dim=ch),
        **_mlp_q_single(ch),
    )


def ppo_models(cfg: Config, agent_id: int) -> ModelDefs:
    obs_dim, act_dim, ah, ch = _dims(cfg, agent_id)
    if cfg.use_equiv:
        from .emlp import zoo as ezoo
        return ezoo.ppo_models(cfg, agent_id)
    return ModelDefs(
        actor_def=mlp.ActorPPO(hidden_dim=ah, action_dim=act_dim),
        critic_def=mlp.VCritic(hidden_dim=ch),
    )
