"""Standard MLP actors/critics for TD3, SAC and PPO.

Architectures mirror the reference model zoo exactly (layer sizes,
activations, init schemes):

* ``ActorTD3``       — reference algos/td3/td3_mlp.py:5-33
* ``CriticTwin``     — reference algos/td3/td3_mlp.py:36-99 (also reused by
  SAC, reference algos/sac/sac.py:9-12); the CTDE variant concatenates all
  agents' obs/actions (td3_mlp.py:102-168)
* ``ActorSAC``       — reference algos/sac/sac_mlp.py:16-78 (Gaussian policy,
  log_std in [-20, 2], tanh squash with log-prob correction)
* ``ActorPPO``       — reference algos/ppo/ppo_mlp.py:6-61 (tanh mean head
  scaled by 0.1 at init, state-independent learnable log_std)
* ``VCritic``        — reference algos/ppo/ppo_mlp.py:64-126 (tanh
  activations, CTDE variant over concatenated obs)

All are flax.linen modules; parameters are plain pytrees that batch, shard
and optimize functionally.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LOG_SIG_MAX = 2.0
LOG_SIG_MIN = -20.0
EPS = 1e-6


class ActorTD3(nn.Module):
    """Deterministic tanh actor (td3_mlp.py:5-33)."""
    hidden_dim: int
    action_dim: int

    @nn.compact
    def __call__(self, obs):
        x = nn.relu(nn.Dense(self.hidden_dim)(obs))
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return jnp.tanh(nn.Dense(self.action_dim)(x))


class CriticTwin(nn.Module):
    """Twin Q networks over concat(state, action) (td3_mlp.py:36-99).

    For CTDE, pass the *already concatenated* global obs/action — the
    reference CTDE critic is the same MLP over the concatenation
    (td3_mlp.py:102-168).
    """
    hidden_dim: int

    @nn.compact
    def __call__(self, obs, action):
        sa = jnp.concatenate([obs, action], axis=-1)
        q1 = nn.relu(nn.Dense(self.hidden_dim, name="q1_fc1")(sa))
        q1 = nn.relu(nn.Dense(self.hidden_dim, name="q1_fc2")(q1))
        q1 = nn.Dense(1, name="q1_fc3")(q1)
        q2 = nn.relu(nn.Dense(self.hidden_dim, name="q2_fc1")(sa))
        q2 = nn.relu(nn.Dense(self.hidden_dim, name="q2_fc2")(q2))
        q2 = nn.Dense(1, name="q2_fc3")(q2)
        return q1, q2

    def q1(self, obs, action):
        sa = jnp.concatenate([obs, action], axis=-1)
        q1 = nn.relu(nn.Dense(self.hidden_dim, name="q1_fc1")(sa))
        q1 = nn.relu(nn.Dense(self.hidden_dim, name="q1_fc2")(q1))
        return nn.Dense(1, name="q1_fc3")(q1)


class CriticSingle(nn.Module):
    """ONE Q network with CriticTwin's architecture, applied to param
    subtrees extracted by ``critic_twin_split`` — the vehicle for running
    several (params, input) twin-critic evaluations as one vmapped forward
    (algos/td3.py stacked critic path)."""
    hidden_dim: int

    @nn.compact
    def __call__(self, obs, action):
        sa = jnp.concatenate([obs, action], axis=-1)
        q = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(sa))
        q = nn.relu(nn.Dense(self.hidden_dim, name="fc2")(q))
        return nn.Dense(1, name="fc3")(q)


def critic_twin_split(params):
    """Twin param tree -> (net1 params, net2 params) for CriticSingle.
    Pure relabeling (no copies under jit)."""
    p = params["params"] if "params" in params else params

    def sub(pref):
        return {"params": {"fc1": p[f"{pref}_fc1"], "fc2": p[f"{pref}_fc2"],
                           "fc3": p[f"{pref}_fc3"]}}

    return sub("q1"), sub("q2")


def _xavier_dense(features, name=None):
    return nn.Dense(
        features, name=name,
        kernel_init=nn.initializers.xavier_uniform(),
        bias_init=nn.initializers.zeros,
    )


class ActorSAC(nn.Module):
    """Squashed-Gaussian actor (sac_mlp.py:16-78), Xavier init."""
    hidden_dim: int
    action_dim: int

    @nn.compact
    def __call__(self, obs):
        x = nn.relu(_xavier_dense(self.hidden_dim)(obs))
        x = nn.relu(_xavier_dense(self.hidden_dim)(x))
        mean = _xavier_dense(self.action_dim, name="mean")(x)
        log_std = _xavier_dense(self.action_dim, name="log_std")(x)
        log_std = jnp.clip(log_std, LOG_SIG_MIN, LOG_SIG_MAX)
        return mean, log_std


def sac_sample(mean, log_std, key):
    """Reparameterized tanh-squashed sample + corrected log-prob
    (sac_mlp.py:55-78).  Returns (action, log_prob, deterministic_action)."""
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    return sac_sample_with_noise(mean, log_std, noise)


def sac_sample_with_noise(mean, log_std, noise):
    """sac_sample with the N(0,1) draw supplied by the caller — used to fuse
    several sample-forwards into one batched forward while keeping each
    block's noise stream exactly what the separate calls drew."""
    std = jnp.exp(log_std)
    x_t = mean + std * noise
    action = jnp.tanh(x_t)
    # Normal log-prob
    log_prob = (
        -0.5 * ((x_t - mean) / std) ** 2
        - log_std - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    log_prob = log_prob - jnp.log((1.0 - action**2) + EPS)
    log_prob = jnp.sum(log_prob, axis=-1, keepdims=True)
    return action, log_prob, jnp.tanh(mean)


class ActorPPO(nn.Module):
    """Gaussian policy with tanh mean and learnable state-independent
    log_std (ppo_mlp.py:6-61); the mean head's weights are scaled by 0.1 and
    bias zeroed at init (ppo_mlp.py:27-28)."""
    hidden_dim: int
    action_dim: int
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs):
        x = nn.relu(nn.Dense(self.hidden_dim)(obs))
        x = nn.relu(nn.Dense(self.hidden_dim)(x))
        mean = nn.Dense(
            self.action_dim, name="mean",
            kernel_init=lambda k, s, d=jnp.float32: (
                nn.initializers.lecun_normal()(k, s, d) * 0.1),
            bias_init=nn.initializers.zeros,
        )(x)
        mean = jnp.tanh(mean)
        log_std = self.param(
            "log_std",
            lambda k, s: jnp.full(s, self.log_std_init, jnp.float32),
            (1, self.action_dim),
        )
        return mean, jnp.broadcast_to(log_std, mean.shape)


def gaussian_logprob(mean, log_std, action):
    std = jnp.exp(log_std)
    return (
        -0.5 * ((action - mean) / std) ** 2
        - log_std - 0.5 * jnp.log(2.0 * jnp.pi)
    )


def gaussian_entropy(log_std):
    return log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e)


class VCritic(nn.Module):
    """V(s) critic with tanh activations (ppo_mlp.py:64-126); for CTDE pass
    the concatenated global obs."""
    hidden_dim: int

    @nn.compact
    def __call__(self, obs):
        v = jnp.tanh(nn.Dense(self.hidden_dim)(obs))
        v = jnp.tanh(nn.Dense(self.hidden_dim)(v))
        return nn.Dense(1)(v)
