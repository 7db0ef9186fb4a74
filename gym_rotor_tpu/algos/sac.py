"""Soft Actor-Critic learner (reference algos/sac/sac.py:15-247).

Squashed-Gaussian actor, twin critics (shared with TD3's critic defs,
sac.py:9-12), fixed or auto-tuned entropy temperature, target-critic Polyak
updates every ``policy_update_freq`` steps, CAPS + spectral regularizers.
Pure jitted update functions over immutable agent states, CTDE branch
included (sac.py:136-144: centralized critic fed all agents' sampled
actions).
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from jax.flatten_util import ravel_pytree

from ..utils.config import Config
from ..models import mlp
from . import regularizers
from .common import flat_init, flat_polyak, make_optimizer, mse, pmean_if
from .replay import Batch
from .td3 import ModelDefs


@struct.dataclass
class SACState:
    actor: Any
    critic: Any
    critic_target: Any
    actor_opt: Any
    critic_opt: Any
    log_alpha: jnp.ndarray
    alpha_opt: Any
    total_it: jnp.ndarray


class SACAgent:
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
        self.alpha_tx = optax.adamw(cfg.lr_a[agent_id])
        # Target Entropy = -dim(A) (sac.py:85-86)
        self.target_entropy = -float(self.action_dim)
        # Projection folding (cfg.equiv_fold) — see td3.TD3Agent
        self.use_fold = bool(cfg.equiv_fold and defs.actor_fold is not None)

    def fold_actor(self, params):
        return self.defs.actor_fold(params) if self.use_fold else params

    def fold_critic(self, params):
        return self.defs.critic_fold(params) if self.use_fold else params

    @property
    def critic_apply_def(self):
        return (self.defs.critic_fast if self.use_fold
                else self.defs.critic_def)

    def init(self, key: jax.Array) -> SACState:
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
        log_alpha = jnp.zeros((), jnp.float32)
        return SACState(
            actor=actor, critic=critic,
            critic_target=jax.tree.map(jnp.copy, critic),
            # flat-space optimizer states (algos/common.py module docstring)
            actor_opt=flat_init(self.actor_tx, actor),
            critic_opt=flat_init(self.critic_tx, critic),
            log_alpha=log_alpha,
            alpha_opt=self.alpha_tx.init(log_alpha),
            total_it=jnp.zeros((), jnp.int32),
        )

    def sample(self, actor_params, obs, key):
        mean, log_std = self.defs.actor_def.apply(actor_params, obs)
        return mlp.sac_sample(mean, log_std, key)

    def sample_f(self, folded_actor_params, obs, key):
        """sample over pre-folded params (callers fold once per use-site)."""
        mean, log_std = self.dist_f(folded_actor_params, obs)
        return mlp.sac_sample(mean, log_std, key)

    def dist_f(self, folded_actor_params, obs):
        """(mean, log_std) over pre-folded params — the raw policy head for
        callers that fuse several sample-forwards into one batch."""
        d = self.defs.actor_fast if self.use_fold else self.defs.actor_def
        return d.apply(folded_actor_params, obs)

    def choose_action(self, state: SACState, obs, key, is_eval=False):
        """Stochastic (train) / deterministic-mean (eval) action
        (sac.py:90-106)."""
        a, _, mean = self.sample(state.actor, obs, key)
        return mean if is_eval else a

    def choose_action_f(self, folded_actor_params, obs, key, is_eval=False):
        """choose_action over pre-folded params (rollout hot path)."""
        a, _, mean = self.sample_f(folded_actor_params, obs, key)
        return mean if is_eval else a

    def alpha(self, state: SACState):
        if self.cfg.automatic_entropy_tuning:
            return jnp.exp(state.log_alpha)
        return jnp.asarray(self.cfg.sac_alpha, jnp.float32)


def train_step(cfg: Config, agents: Sequence[SACAgent],
               states: List[SACState], batch: Batch, key: jax.Array,
               axis_name: str = None, gate_now: bool = None):
    """``gate_now``: static placement of the delayed target-critic Polyak
    update (sac.py:219-221) — None = runtime lax.cond, True/False = compile
    the branch statically (see td3.train_step for the contract)."""
    new_states = list(states)
    metrics = {}
    for i in range(len(agents)):
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
    ks = jax.random.split(key, 6)

    obs, act = batch.obs[i], batch.act[i]
    rwd, next_obs, done = batch.rwd[i], batch.next_obs[i], batch.done[i]
    alpha = agent.alpha(state)

    # ----- target-policy action + entropy (sac.py:135-153)
    if agent.is_ctde:
        next_acts = []
        kk = ks[0]
        for j, other in enumerate(agents):
            kk, kn = jax.random.split(kk)
            a_n, _, _ = other.sample_f(other.fold_actor(states[j].actor),
                                       batch.next_obs[j], kn)
            next_acts.append(a_n)
        _, logp_next, _ = agent.sample_f(agent.fold_actor(state.actor),
                                         next_obs, ks[1])
        t_obs = jnp.concatenate(batch.next_obs, axis=-1)
        t_act = jnp.concatenate(next_acts, axis=-1)
    else:
        a_next, logp_next, _ = agent.sample_f(agent.fold_actor(state.actor),
                                              next_obs, ks[1])
        t_obs, t_act = next_obs, a_next

    c_obs = (jnp.concatenate(batch.obs, axis=-1) if agent.is_ctde else obs)
    c_act = (jnp.concatenate(batch.act, axis=-1) if agent.is_ctde else act)

    # ----- critic update (sac.py:155-170)
    tpf = agent.fold_critic(state.critic_target)

    flat_c, unravel_c = ravel_pytree(state.critic)

    def critic_loss_fn(cflat):
        cp = unravel_c(cflat)  # flat update path (algos/common.py)
        # fold inside the loss: grads flow through the projection, spectral
        # reg sees raw weights (see td3.py critic_loss_fn)
        cpf = agent.fold_critic(cp)
        tq1, tq2 = agent.critic_apply_def.apply(tpf, t_obs, t_act)
        q1, q2 = agent.critic_apply_def.apply(cpf, c_obs, c_act)
        target_q = jax.lax.stop_gradient(
            rwd + cfg.discount * (1.0 - done)
            * (jnp.minimum(tq1, tq2) - alpha * logp_next))
        loss = mse(q1, target_q) + mse(q2, target_q)
        if agent.defs.critic_spectral is not None:
            ws, extras = agent.defs.critic_spectral(cp)
            loss = loss + 1e-8 * regularizers.spectral_norm_regularization(
                ws, ks[2], extras)
        return loss

    closs, cgrad = jax.value_and_grad(critic_loss_fn)(flat_c)
    cgrad = pmean_if(cgrad, axis_name)
    cupd, copt = agent.critic_tx.update(cgrad, state.critic_opt, flat_c)
    flat_c_new = optax.apply_updates(flat_c, cupd)
    critic = unravel_c(flat_c_new)

    # ----- actor update (sac.py:172-203)
    critic_f = agent.fold_critic(critic)  # constant inside the actor loss

    def q12_fn(o, a):
        return agent.critic_apply_def.apply(critic_f, o, a)

    flat_a, unravel_a = ravel_pytree(state.actor)

    def actor_loss_fn(aflat):
        ap = unravel_a(aflat)  # flat update path (algos/common.py)
        apf = agent.fold_actor(ap)  # one fold, fanned out to all forwards
        if agent.is_ctde:
            acts = []
            kk = ks[3]
            for j, other in enumerate(agents):
                kk, kn = jax.random.split(kk)
                pf = apf if j == i else other.fold_actor(states[j].actor)
                a_j, _, _ = other.sample_f(pf, batch.obs[j], kn)
                acts.append(a_j)
            _, logp, _ = agent.sample_f(apf, obs, ks[4])
            q1, q2 = q12_fn(c_obs, jnp.concatenate(acts, axis=-1))
            loss = -(jnp.minimum(q1, q2) - alpha * logp).mean()
            # CAPS (sac.py:194-195) — sampled actions (policy_reg:9-11)
            def act_fn(o):
                a, _, _ = agent.sample_f(apf, o, ks[5])
                return a
            caps = regularizers.caps_regularization(
                cfg, agent.agent_id, act_fn, obs, next_obs, ks[3])
        else:
            # ONE actor forward serves the policy sample AND all three CAPS
            # comparisons: [obs; obs; obs_next; obs+eps] stacked along the
            # batch, with each block given exactly the noise stream the
            # separate calls drew (a_pi <- ks[4]; the three CAPS samples
            # share ks[5], as before)
            eps = regularizers.caps_noise(cfg, ks[3], obs)
            obs4 = jnp.concatenate([obs, obs, next_obs, obs + eps], axis=0)
            mean4, log_std4 = agent.dist_f(apf, obs4)
            B = obs.shape[0]
            n_pi = jax.random.normal(ks[4], (B, mean4.shape[-1]))
            n_caps = jax.random.normal(ks[5], (B, mean4.shape[-1]))
            noise4 = jnp.concatenate([n_pi, n_caps, n_caps, n_caps], axis=0)
            a4, logp4, _ = mlp.sac_sample_with_noise(mean4, log_std4, noise4)
            a4c = jnp.clip(a4, -cfg.max_action, cfg.max_action)
            a_pi, logp = a4[:B], logp4[:B]
            q1, q2 = q12_fn(obs, a_pi)
            loss = -(jnp.minimum(q1, q2) - alpha * logp).mean()
            caps = regularizers.caps_terms(
                cfg, agent.agent_id, a4c[B:2 * B], a4c[2 * B:3 * B],
                a4c[3 * B:])
        if agent.defs.actor_spectral is not None:
            ws, extras = agent.defs.actor_spectral(ap)
            loss = loss + 1e-5 * regularizers.spectral_norm_regularization(
                ws, ks[2], extras)
        loss = loss + caps
        return loss, logp

    (aloss, logp), agrad = jax.value_and_grad(actor_loss_fn, has_aux=True)(
        flat_a)
    agrad = pmean_if(agrad, axis_name)
    aupd, aopt = agent.actor_tx.update(agrad, state.actor_opt, flat_a)
    actor = unravel_a(optax.apply_updates(flat_a, aupd))

    # ----- entropy temperature (sac.py:205-217)
    if cfg.automatic_entropy_tuning:
        def alpha_loss_fn(la):
            return -(la * jax.lax.stop_gradient(
                agent.target_entropy + logp)).mean()
        aloss_t, tgrad = jax.value_and_grad(alpha_loss_fn)(state.log_alpha)
        tupd, topt = agent.alpha_tx.update(tgrad, state.alpha_opt,
                                           state.log_alpha)
        log_alpha = optax.apply_updates(state.log_alpha, tupd)
    else:
        aloss_t = jnp.zeros(())
        log_alpha, topt = state.log_alpha, state.alpha_opt

    total_it = state.total_it + 1
    # ----- delayed target-critic update (sac.py:219-221)
    def do_polyak(_):
        return flat_polyak(state.critic_target, flat_c_new, cfg.tau,
                           unravel_c)

    if gate_now is None:
        ctgt = jax.lax.cond(
            total_it % cfg.policy_update_freq == 0,
            do_polyak, lambda _: state.critic_target, None)
    elif gate_now:
        ctgt = do_polyak(None)
    else:
        ctgt = state.critic_target

    new_state = SACState(
        actor=actor, critic=critic, critic_target=ctgt,
        actor_opt=aopt, critic_opt=copt,
        log_alpha=log_alpha, alpha_opt=topt, total_it=total_it,
    )
    return new_state, {"critic_loss": closs, "actor_loss": aloss,
                       "alpha_loss": aloss_t,
                       "alpha": agent.alpha(new_state)}
