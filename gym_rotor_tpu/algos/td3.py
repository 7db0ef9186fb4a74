"""TD3 / MATD3 learner as pure jitted update functions.

Algorithm semantics mirror reference algos/td3/td3.py:13-238 exactly:
twin critics with clipped double-Q, target policy smoothing
(sigma=target_noise, clip=noise_clip), delayed policy updates
(policy_update_freq), Polyak targets (tau), AdamW + cosine warm restarts,
CAPS smoothness regularization on the actor, optional spectral-norm
regularization (equivariant models), and the CTDE branch that queries all
agents' target actors for a centralized critic (td3.py:124-137) => MATD3.

Re-design vs the reference: agents are immutable pytree states updated by a
pure ``train_step`` (one fused XLA program per update, no host round-trips);
multi-agent updates are expressed over a list of such states so the whole
MATD3 update jits as one graph.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from jax.flatten_util import ravel_pytree

from ..utils.config import Config
from . import regularizers
from .common import flat_init, flat_polyak, make_optimizer, mse, pmean_if
from .replay import Batch


# Negative result (round 4, kept as a DESIGN.md note + probe history):
# evaluating the update's four twin-Q forwards as ONE vmapped forward over
# stacked params measured +6.5 ms/update on TPU v5e — ops carrying a leading
# params-batch dim (gathers, batched dot_generals) lower poorly there.  The
# stacked code path was removed; ``critic_split``/``critic_single`` stay for
# the LIVE optimization below (actor loss evaluates net1 only).


class ModelDefs(NamedTuple):
    """Static module definitions + optional spectral-norm weight extractors
    (set for EMLP models, None for MLPs).

    ``*_fast`` are ``project=False`` twins of the EMLP defs and ``*_fold``
    the matching param-folding fns (models/emlp/nn.py:make_fold_fn); set only
    for EMLP models, consumed when cfg.equiv_fold is on."""
    actor_def: Any
    critic_def: Any
    actor_spectral: Optional[Callable] = None
    critic_spectral: Optional[Callable] = None
    actor_fast: Any = None
    critic_fast: Any = None
    actor_fold: Optional[Callable] = None
    critic_fold: Optional[Callable] = None
    # Stacked-critic machinery (Q critics only): ``critic_single`` applies
    # ONE of the twin networks to a param subtree from ``critic_split``, so
    # several (params, input) twin evaluations run as one vmapped forward —
    # the learner-update op-count optimization (see _train_one).
    critic_single: Any = None
    critic_single_fast: Any = None
    critic_split: Optional[Callable] = None


@struct.dataclass
class TD3State:
    actor: Any
    critic: Any
    actor_target: Any
    critic_target: Any
    actor_opt: Any
    critic_opt: Any
    total_it: jnp.ndarray


class TD3Agent:
    """Per-agent static configuration (module defs, optimizers, dims)."""

    def __init__(self, cfg: Config, agent_id: int, defs: ModelDefs):
        self.cfg = cfg
        self.agent_id = agent_id
        self.defs = defs
        self.obs_dim = cfg.obs_dim_n[agent_id]
        self.action_dim = cfg.action_dim_n[agent_id]
        self.is_ctde = (cfg.framework == "MODUL"
                        and cfg.module_training == "CTDE")
        self.actor_tx = make_optimizer(cfg, cfg.lr_a[agent_id])
        self.critic_tx = make_optimizer(cfg, cfg.lr_c[agent_id])
        # Projection folding (cfg.equiv_fold): fold the equivariant
        # projection once per use-site, forward through the project=False
        # twin.  fold_*/act_f degrade to identity/plain apply for MLPs.
        self.use_fold = bool(cfg.equiv_fold and defs.actor_fold is not None)

    def fold_actor(self, params):
        return self.defs.actor_fold(params) if self.use_fold else params

    def fold_critic(self, params):
        return self.defs.critic_fold(params) if self.use_fold else params

    @property
    def actor_apply_def(self):
        return self.defs.actor_fast if self.use_fold else self.defs.actor_def

    @property
    def critic_apply_def(self):
        return (self.defs.critic_fast if self.use_fold
                else self.defs.critic_def)

    def init(self, key: jax.Array) -> TD3State:
        cfg = self.cfg
        ka, kc = jax.random.split(key)
        obs = jnp.zeros((1, self.obs_dim), jnp.float32)
        act = jnp.zeros((1, self.action_dim), jnp.float32)
        actor = jax.jit(self.defs.actor_def.init)(ka, obs)
        if self.is_ctde:
            cobs = jnp.zeros((1, sum(cfg.obs_dim_n)), jnp.float32)
            cact = jnp.zeros((1, sum(cfg.action_dim_n)), jnp.float32)
            critic = jax.jit(self.defs.critic_def.init)(kc, cobs, cact)
        else:
            critic = jax.jit(self.defs.critic_def.init)(kc, obs, act)
        return TD3State(
            actor=actor, critic=critic,
            actor_target=jax.tree.map(jnp.copy, actor),
            critic_target=jax.tree.map(jnp.copy, critic),
            # optimizer states live in the FLAT parameter space (see
            # algos/common.py module docstring); params/targets stay trees
            # so checkpoints, the .pth importer and every apply site are
            # unchanged
            actor_opt=flat_init(self.actor_tx, actor),
            critic_opt=flat_init(self.critic_tx, critic),
            total_it=jnp.zeros((), jnp.int32),
        )

    def act(self, actor_params, obs):
        return self.defs.actor_def.apply(actor_params, obs)

    def act_f(self, folded_actor_params, obs):
        """Forward through the fast twin: callers pass params already run
        through fold_actor (identity when folding is off)."""
        return self.actor_apply_def.apply(folded_actor_params, obs)

    def choose_action(self, state: TD3State, obs, noise_std, key):
        """Policy + exploration noise (td3.py:82-96)."""
        a = self.act(state.actor, obs)
        noise = noise_std * jax.random.normal(key, a.shape, a.dtype)
        return jnp.clip(a + noise, -self.cfg.max_action, self.cfg.max_action)

    def choose_action_f(self, folded_actor_params, obs, noise_std, key):
        """choose_action over pre-folded params (rollout hot path: fold once
        per chunk outside the scan instead of per tick)."""
        a = self.act_f(folded_actor_params, obs)
        noise = noise_std * jax.random.normal(key, a.shape, a.dtype)
        return jnp.clip(a + noise, -self.cfg.max_action, self.cfg.max_action)


def _critic_apply(agent: TD3Agent, params, obs, act):
    return agent.defs.critic_def.apply(params, obs, act)


def _critic_apply_f(agent: TD3Agent, folded_params, obs, act):
    return agent.critic_apply_def.apply(folded_params, obs, act)


def train_step(cfg: Config, agents: Sequence[TD3Agent],
               states: List[TD3State], batch: Batch, key: jax.Array,
               axis_name: str = None, gate_now: bool = None):
    """One TD3 update for every agent (reference trains each agent per env
    step, main.py:191-202).  Returns (new_states, metrics).

    ``axis_name``: when called inside shard_map/pmap over a data-parallel
    mesh axis, gradients are pmean-reduced over it before the optimizer
    update (replicated params + sharded batch => MATD3 data parallelism).

    ``gate_now``: static placement of the delayed actor/target branch
    (td3.py:177).  ``None`` keeps the reference-faithful runtime gate
    (lax.cond on total_it % policy_update_freq); True/False compile the
    taken/skipped branch STATICALLY — callers that schedule updates in
    freq-aligned groups (parallel/train_step.py) pass the position's truth
    value, removing the cond's fusion boundary from the scan body.  Only
    valid when the caller guarantees gate_now == (total_it % freq == 0)
    for the update being applied; results are then bit-identical
    (tests/test_algos.py::test_static_gate_matches_runtime_cond).
    """
    new_states = list(states)
    metrics = {}
    for i, agent in enumerate(agents):
        key, sub = jax.random.split(key)
        new_states[i], m = _train_one(cfg, agents, new_states, i, batch, sub,
                                      axis_name, gate_now)
        metrics.update({f"agent{i}/{k}": v for k, v in m.items()})
    return new_states, metrics


def _train_one(cfg: Config, agents, states, i: int, batch: Batch,
               key: jax.Array, axis_name: str = None,
               gate_now: bool = None):
    agent = agents[i]
    state = states[i]
    k_noise, k_caps, k_spec, k_spec2 = jax.random.split(key, 4)

    obs = batch.obs[i]
    act = batch.act[i]
    rwd = batch.rwd[i]
    next_obs = batch.next_obs[i]
    done = batch.done[i]

    # ----- target-policy smoothing action (td3.py:123-137)
    if agent.is_ctde:
        next_acts = []
        kk = k_noise
        for j, other in enumerate(agents):
            kk, kn = jax.random.split(kk)
            a_next = other.act_f(other.fold_actor(states[j].actor_target),
                                 batch.next_obs[j])
            noise = jnp.clip(
                cfg.target_noise * jax.random.normal(kn, a_next.shape),
                -cfg.noise_clip, cfg.noise_clip)
            next_acts.append(
                jnp.clip(a_next + noise, -cfg.max_action, cfg.max_action))
        t_obs = jnp.concatenate(batch.next_obs, axis=-1)
        t_act = jnp.concatenate(next_acts, axis=-1)
        c_obs = jnp.concatenate(batch.obs, axis=-1)
        c_act = jnp.concatenate(batch.act, axis=-1)
    else:
        a_next = agent.act_f(agent.fold_actor(state.actor_target), next_obs)
        noise = jnp.clip(
            cfg.target_noise * jax.random.normal(k_noise, a_next.shape),
            -cfg.noise_clip, cfg.noise_clip)
        t_obs = next_obs
        t_act = jnp.clip(a_next + noise, -cfg.max_action, cfg.max_action)
        c_obs, c_act = obs, act

    # ----- critic update (td3.py:138-171)
    tpf = agent.fold_critic(state.critic_target)
    split = agent.defs.critic_split
    single_def = (agent.defs.critic_single_fast if agent.use_fold
                  else agent.defs.critic_single)

    flat_c, unravel_c = ravel_pytree(state.critic)

    def critic_loss_fn(cflat):
        # differentiate wrt the RAVELED params (flat update path,
        # algos/common.py): the gradient comes back as one vector and the
        # whole optimizer chain runs on it
        cp = unravel_c(cflat)
        # fold INSIDE the loss so the gradient flows through the projection
        # (preserving the reference's full-space AdamW state, nn.py:26-36;
        # spectral reg sees the raw weights like the reference's traversal)
        cpf = agent.fold_critic(cp)
        tq1, tq2 = _critic_apply_f(agent, tpf, t_obs, t_act)
        q1, q2 = _critic_apply_f(agent, cpf, c_obs, c_act)
        target_q = jax.lax.stop_gradient(
            rwd + cfg.discount * (1.0 - done) * jnp.minimum(tq1, tq2))
        loss = mse(q1, target_q) + mse(q2, target_q)
        if agent.defs.critic_spectral is not None:
            ws, extras = agent.defs.critic_spectral(cp)
            loss = loss + 1e-8 * regularizers.spectral_norm_regularization(
                ws, k_spec, extras)
        return loss

    closs, cgrad = jax.value_and_grad(critic_loss_fn)(flat_c)
    cgrad = pmean_if(cgrad, axis_name)
    cupd, copt = agent.critic_tx.update(cgrad, state.critic_opt, flat_c)
    flat_c_new = optax.apply_updates(flat_c, cupd)
    critic = unravel_c(flat_c_new)

    total_it = state.total_it + 1

    # ----- delayed actor + target update (td3.py:177-211)
    def do_actor(_):
        # the (just-updated) critic is a constant inside the actor loss:
        # fold it once outside the differentiated closure
        critic_f = agent.fold_critic(critic)
        if split is not None:
            c1f, _ = split(critic_f)                 # net2 never evaluated

            def q1_fn(o, a):
                return single_def.apply(c1f, o, a)
        else:
            def q1_fn(o, a):
                return _critic_apply_f(agent, critic_f, o, a)[0]

        flat_a, unravel_a = ravel_pytree(state.actor)

        def actor_loss_fn(aflat):
            ap = unravel_a(aflat)
            # one fold; ONE actor forward serves the policy action AND both
            # CAPS comparisons — [obs; obs_next; obs+eps] stacked along the
            # batch (row-independent nets => per-row results identical to
            # three separate forwards)
            apf = agent.fold_actor(ap)
            eps = regularizers.caps_noise(cfg, k_caps, obs)
            obs3 = jnp.concatenate([obs, next_obs, obs + eps], axis=0)
            a3 = jnp.clip(agent.act_f(apf, obs3), -cfg.max_action,
                          cfg.max_action)
            a_cur, a_nxt, a_prt = jnp.split(a3, 3, axis=0)
            if agent.is_ctde:
                # all agents' *current* actors (td3.py:181)
                acts = [
                    a_cur if j == i else jnp.clip(
                        other.act_f(other.fold_actor(states[j].actor),
                                    batch.obs[j]),
                        -cfg.max_action, cfg.max_action)
                    for j, other in enumerate(agents)
                ]
                q1 = q1_fn(c_obs, jnp.concatenate(acts, axis=-1))
            else:
                q1 = q1_fn(obs, a_cur)
            loss = -q1.mean()
            if agent.defs.actor_spectral is not None:
                ws, extras = agent.defs.actor_spectral(ap)
                loss = loss + 1e-5 * regularizers.spectral_norm_regularization(
                    ws, k_spec2, extras)
            # CAPS smoothness (td3.py:196)
            loss = loss + regularizers.caps_terms(
                cfg, agent.agent_id, a_cur, a_nxt, a_prt)
            return loss

        aloss, agrad = jax.value_and_grad(actor_loss_fn)(flat_a)
        agrad = pmean_if(agrad, axis_name)
        aupd, aopt = agent.actor_tx.update(agrad, state.actor_opt, flat_a)
        flat_a_new = optax.apply_updates(flat_a, aupd)
        actor = unravel_a(flat_a_new)
        new_ct = flat_polyak(state.critic_target, flat_c_new, cfg.tau,
                             unravel_c)
        new_at = flat_polyak(state.actor_target, flat_a_new, cfg.tau,
                             unravel_a)
        return actor, aopt, new_at, new_ct, aloss

    def skip_actor(_):
        return (state.actor, state.actor_opt, state.actor_target,
                state.critic_target, jnp.zeros((), jnp.float32))

    if gate_now is None:
        actor, aopt, atgt, ctgt, aloss = jax.lax.cond(
            total_it % cfg.policy_update_freq == 0, do_actor, skip_actor,
            None)
    elif gate_now:
        actor, aopt, atgt, ctgt, aloss = do_actor(None)
    else:
        actor, aopt, atgt, ctgt, aloss = skip_actor(None)

    new_state = TD3State(
        actor=actor, critic=critic, actor_target=atgt, critic_target=ctgt,
        actor_opt=aopt, critic_opt=copt, total_it=total_it,
    )
    return new_state, {"critic_loss": closs, "actor_loss": aloss}
