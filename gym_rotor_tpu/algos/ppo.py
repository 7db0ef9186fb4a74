"""PPO learner (reference algos/ppo/ppo.py:13-243).

GAE(lambda) advantages computed by a reverse lax.scan over the T_horizon
rollout, clipped-surrogate actor updates and L2-regularized critic updates
over K_epochs of shuffled minibatches, decaying entropy bonus, CAPS +
spectral regularizers, CTDE centralized V(s) branch.

Divergence (documented): the reference iterates ceil(T/mb) minibatches with a
ragged final slice (ppo.py:152-168); we use T//mb equal-size minibatches per
epoch (the remainder is dropped for that epoch's permutation — different
rows each epoch), which keeps the update a single fused scan.
"""
from __future__ import annotations

from typing import Any, List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from jax.flatten_util import ravel_pytree

from ..utils.config import Config
from ..models import mlp
from . import regularizers
from .common import flat_init, make_optimizer, pmean_if
from .td3 import ModelDefs


@struct.dataclass
class PPOState:
    actor: Any
    critic: Any
    actor_opt: Any
    critic_opt: Any
    entropy_coef: jnp.ndarray
    total_it: jnp.ndarray


class Horizon(NamedTuple):
    """One T_horizon on-policy segment per agent (replay_buffer acting as a
    sequential rollout buffer, replay_buffer.py:14-16)."""
    obs: tuple          # per-agent (T, obs_dim)
    act: tuple          # per-agent (T, act_dim)
    rwd: tuple          # per-agent (T, 1)
    next_obs: tuple
    done: tuple         # per-agent (T, 1)
    logprob: tuple      # per-agent (T, act_dim)


class PPOAgent:
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

    def init(self, key: jax.Array) -> PPOState:
        cfg = self.cfg
        ka, kc = jax.random.split(key)
        obs = jnp.zeros((1, self.obs_dim), jnp.float32)
        actor = jax.jit(self.defs.actor_def.init)(ka, obs)
        cdim = sum(cfg.obs_dim_n) if self.is_ctde else self.obs_dim
        critic = jax.jit(self.defs.critic_def.init)(
            kc, jnp.zeros((1, cdim), jnp.float32))
        return PPOState(
            actor=actor, critic=critic,
            # flat-space optimizer states (algos/common.py module docstring)
            actor_opt=flat_init(self.actor_tx, actor),
            critic_opt=flat_init(self.critic_tx, critic),
            entropy_coef=jnp.asarray(cfg.entropy_coef, jnp.float32),
            total_it=jnp.zeros((), jnp.int32),
        )

    def dist(self, actor_params, obs):
        return self.defs.actor_def.apply(actor_params, obs)

    def dist_f(self, folded_actor_params, obs):
        """dist over pre-folded params (callers fold once per use-site)."""
        d = self.defs.actor_fast if self.use_fold else self.defs.actor_def
        return d.apply(folded_actor_params, obs)

    def choose_action(self, state: PPOState, obs, key, is_eval=False):
        """(action, per-dim logprob) (ppo.py:82-102)."""
        return self.choose_action_f(self.fold_actor(state.actor), obs, key,
                                    is_eval)

    def choose_action_f(self, folded_actor_params, obs, key, is_eval=False):
        """choose_action over pre-folded params (rollout hot path)."""
        mean, log_std = self.dist_f(folded_actor_params, obs)
        if is_eval:
            a = jnp.clip(mean, -self.cfg.max_action, self.cfg.max_action)
            return a, jnp.zeros_like(a)
        a = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        a = jnp.clip(a, -self.cfg.max_action, self.cfg.max_action)
        logp = mlp.gaussian_logprob(mean, log_std, a)
        return a, logp


def gae(cfg: Config, values, next_values, rewards, dones, axis_name=None):
    """Generalized Advantage Estimation (ppo.py:124-146) via reverse scan.

    With ``axis_name`` set (env-sharded horizon inside shard_map) the
    normalization statistics are computed over the *global* horizon via
    psum/pmean so every device normalizes identically."""
    deltas = rewards + cfg.discount * next_values * (1.0 - dones) - values

    def body(carry, xs):
        delta, done = xs
        adv = delta + cfg.discount * (1.0 - done) * cfg.GAE_lambda * carry
        return adv, adv

    _, advs = jax.lax.scan(body, jnp.zeros_like(deltas[0]),
                           (deltas, dones), reverse=True)
    td_targets = advs + values
    # torch .std() applies Bessel's correction (ddof=1) — ppo.py:146
    m = advs.mean()
    n_tot = advs.size
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)
        n_tot = n_tot * jax.lax.psum(1, axis_name)
    var = jnp.mean((advs - m) ** 2)
    if axis_name is not None:
        var = jax.lax.pmean(var, axis_name)
    std = jnp.sqrt(var * n_tot / max(n_tot - 1, 1))
    advs = (advs - m) / (std + 1e-4)
    return advs, td_targets


def train_step(cfg: Config, agents: Sequence[PPOAgent],
               states: List[PPOState], data: Horizon, key: jax.Array,
               axis_name: str = None):
    """One full PPO update per agent.  ``axis_name``: when the horizon is
    env-sharded inside shard_map, minibatch gradients are pmean-reduced over
    the mesh axis so replicated params stay bit-identical."""
    new_states = list(states)
    metrics = {}
    for i in range(len(agents)):
        key, sub = jax.random.split(key)
        new_states[i], m = _train_one(cfg, agents, new_states, i, data, sub,
                                      axis_name)
        metrics.update({f"agent{i}/{k}": v for k, v in m.items()})
    return new_states, metrics


def _train_one(cfg: Config, agents, states, i: int, data: Horizon,
               key: jax.Array, axis_name: str = None):
    agent = agents[i]
    state = states[i]

    if agent.is_ctde:
        v_obs = jnp.concatenate(data.obs, axis=-1)
        v_next_obs = jnp.concatenate(data.next_obs, axis=-1)
    else:
        v_obs, v_next_obs = data.obs[i], data.next_obs[i]

    critic_fv = agent.fold_critic(state.critic)  # one fold, two forwards

    def v_apply(o):
        # Batched (T, B, d) horizons evaluate the critic in time-slice
        # CHUNKS: the EMLP bilinear materializes (rows, n_slots)
        # intermediates (n_slots ~ 1.8k for the Mirror-tower V-critic), so
        # a fully flattened T*B horizon is O(GB) — at 4096 envs x 50 ticks
        # the pre-chunking flat path exceeded HBM (21.9G peak, measured).
        # Chunking caps the intermediate at (C*B, n_slots) while cutting
        # the number of sequential critic forwards T/C-fold vs the old
        # strictly per-slice lax.map (identical results either way).
        if o.ndim == 3:
            T, B = o.shape[0], o.shape[1]
            target = max(32768 // max(B, 1), 1)
            C = max([d for d in range(1, T + 1)
                     if T % d == 0 and d <= target], default=1)
            chunked = o.reshape(T // C, C * B, o.shape[-1])
            out = jax.lax.map(
                lambda oc: agent.critic_apply_def.apply(critic_fv, oc),
                chunked)
            return out.reshape(T, B, -1)
        return agent.critic_apply_def.apply(critic_fv, o)

    values = v_apply(v_obs)
    next_values = v_apply(v_next_obs)
    # GAE scans over the time axis; with batched envs ((T, B, ...) arrays)
    # the scan carry is (B, 1) so every env's advantage chain is independent.
    advs, td_targets = gae(cfg, values, next_values, data.rwd[i],
                           data.done[i], axis_name)
    advs = jax.lax.stop_gradient(advs)
    td_targets = jax.lax.stop_gradient(td_targets)

    entropy_coef = state.entropy_coef * cfg.entropy_coef_decay  # ppo.py:149

    obs_i, act_i, logp_old_i = data.obs[i], data.act[i], data.logprob[i]
    next_obs_i = data.next_obs[i]
    if obs_i.ndim == 3:
        # flatten (T, B, d) -> (T*B, d) after GAE
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        obs_i, act_i, logp_old_i = flat(obs_i), flat(act_i), flat(logp_old_i)
        next_obs_i, v_obs = flat(next_obs_i), flat(v_obs)
        advs, td_targets = flat(advs), flat(td_targets)
    T = obs_i.shape[0]

    n_mb_a = max(T // cfg.actor_batch_size, 1)
    n_mb_c = max(T // cfg.critic_batch_size, 1)
    mb_a = min(cfg.actor_batch_size, T)
    mb_c = min(cfg.critic_batch_size, T)

    def epoch_body(carry, ek):
        actor, aopt, critic, copt = carry
        k_perm, k_caps, k_spec = jax.random.split(ek, 3)
        perm = jax.random.permutation(k_perm, T)

        # ---- actor minibatches (ppo.py:166-190)
        def actor_mb(carry, idx):
            actor, aopt = carry
            o = obs_i[idx]
            a = act_i[idx]
            lp_old = logp_old_i[idx]
            ad = advs[idx]
            no = next_obs_i[idx]

            def loss_fn(aflat):
                ap = unravel_a(aflat)  # flat update path (algos/common.py)
                # one fold; ONE actor forward serves the surrogate loss AND
                # both CAPS comparisons — [o; o_next; o+eps] stacked along
                # the batch (row-independent nets)
                apf = agent.fold_actor(ap)
                eps = regularizers.caps_noise(cfg, k_caps, o)
                o3 = jnp.concatenate([o, no, o + eps], axis=0)
                mean3, log_std3 = agent.dist_f(apf, o3)
                mb = o.shape[0]
                mean, log_std = mean3[:mb], log_std3[:mb]
                entropy = jnp.sum(mlp.gaussian_entropy(log_std), axis=-1,
                                  keepdims=True)
                lp = mlp.gaussian_logprob(mean, log_std, a)
                ratio = jnp.exp(lp.sum(-1, keepdims=True)
                                - lp_old.sum(-1, keepdims=True))
                s1 = ratio * ad
                s2 = jnp.clip(ratio, 1.0 - cfg.clip_rate,
                              1.0 + cfg.clip_rate) * ad
                loss = -(jnp.minimum(s1, s2) + entropy_coef * entropy).mean()
                if agent.defs.actor_spectral is not None:
                    ws, extras = agent.defs.actor_spectral(ap)
                    loss = loss + 1e-5 * \
                        regularizers.spectral_norm_regularization(
                            ws, k_spec, extras)
                m3c = jnp.clip(mean3, -cfg.max_action, cfg.max_action)
                loss = loss + regularizers.caps_terms(
                    cfg, agent.agent_id, m3c[:mb], m3c[mb:2 * mb],
                    m3c[2 * mb:])
                return loss

            al, ag = jax.value_and_grad(loss_fn)(actor)
            ag = pmean_if(ag, axis_name)
            au, aopt = agent.actor_tx.update(ag, aopt, actor)
            actor = optax.apply_updates(actor, au)
            return (actor, aopt), al  # carry is the FLAT actor vector

        idxs_a = perm[: n_mb_a * mb_a].reshape(n_mb_a, mb_a)
        (actor, aopt), alosses = jax.lax.scan(actor_mb, (actor, aopt), idxs_a)

        # ---- critic minibatches (ppo.py:192-214)
        def critic_mb(carry, idx):
            critic, copt = carry
            vo = v_obs[idx]
            tt = td_targets[idx]

            def loss_fn(cflat):
                cp = unravel_c(cflat)  # flat update path (algos/common.py)
                # fold inside the loss; L2 + spectral regs see RAW kernels
                # like the reference's named_parameters traversal
                loss = jnp.mean(
                    (agent.critic_apply_def.apply(agent.fold_critic(cp), vo)
                     - tt) ** 2)
                # L2 on kernels ('weight' params, ppo.py:202-204)
                l2 = sum(jnp.sum(w ** 2) for w in _kernels(cp))
                loss = loss + cfg.l2_reg * l2
                if agent.defs.critic_spectral is not None:
                    ws, extras = agent.defs.critic_spectral(cp)
                    loss = loss + 1e-10 * \
                        regularizers.spectral_norm_regularization(
                            ws, k_spec, extras)
                return loss

            cl, cg = jax.value_and_grad(loss_fn)(critic)
            cg = pmean_if(cg, axis_name)
            cu, copt = agent.critic_tx.update(cg, copt, critic)
            critic = optax.apply_updates(critic, cu)
            return (critic, copt), cl

        idxs_c = perm[: n_mb_c * mb_c].reshape(n_mb_c, mb_c)
        (critic, copt), closses = jax.lax.scan(critic_mb, (critic, copt),
                                               idxs_c)
        return (actor, aopt, critic, copt), (alosses[-1], closses[-1])

    flat_a, unravel_a = ravel_pytree(state.actor)
    flat_c0, unravel_c = ravel_pytree(state.critic)

    ekeys = jax.random.split(key, cfg.K_epochs)
    (actor, aopt, critic, copt), (alosses, closses) = jax.lax.scan(
        epoch_body, (flat_a, state.actor_opt, flat_c0,
                     state.critic_opt), ekeys)

    new_state = PPOState(
        actor=unravel_a(actor), critic=unravel_c(critic),
        actor_opt=aopt, critic_opt=copt,
        entropy_coef=entropy_coef, total_it=state.total_it + 1,
    )
    return new_state, {"actor_loss": alosses[-1], "critic_loss": closses[-1]}


def _kernels(params):
    """All Dense kernels in a flax param tree (the reference's 'weight'
    parameters, ppo.py:202-204)."""
    out = []

    def visit(p):
        if isinstance(p, dict):
            for k, v in p.items():
                if k == "kernel":
                    out.append(v)
                else:
                    visit(v)

    visit(params if isinstance(params, dict) else dict(params))
    return out
