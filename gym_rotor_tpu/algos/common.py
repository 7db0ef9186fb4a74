"""Shared learner plumbing: optimizers, schedules, target updates."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cosine_warm_restarts(base_lr: float, t0: int = 1_000_000,
                         eta_min: float = 1e-5):
    """CosineAnnealingWarmRestarts(T_0=1e6, eta_min=1e-5) as used for every
    optimizer in the reference (e.g. algos/td3/td3.py:79-80):
    lr(t) = eta_min + (base - eta_min) * (1 + cos(pi * (t mod T0)/T0)) / 2.
    """
    def schedule(step):
        t = jnp.mod(step.astype(jnp.float32), t0) / t0
        return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    return schedule


def make_optimizer(cfg, base_lr: float) -> optax.GradientTransformation:
    """AdamW (torch defaults: betas 0.9/0.999, eps 1e-8, weight_decay 1e-2 —
    td3.py:75-76) + global-norm gradient clipping (grad_max_norm, reference
    td3.py:168-169) + the cosine warm-restart schedule."""
    tx = [
        optax.clip_by_global_norm(cfg.grad_max_norm)
        if cfg.use_clip_grad_norm else optax.identity(),
        optax.adamw(
            learning_rate=cosine_warm_restarts(base_lr),
            b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2,
        ),
    ]
    return optax.chain(*tx)


def soft_update(target_params, params, tau: float):
    """Polyak averaging: target <- tau * params + (1 - tau) * target
    (td3.py:207-211)."""
    return jax.tree.map(
        lambda t, p: tau * p + (1.0 - tau) * t, target_params, params
    )


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def pmean_if(tree, axis_name):
    """pmean-reduce a gradient pytree when running inside shard_map/pmap
    over ``axis_name`` (None = single-device no-op)."""
    if axis_name is None:
        return tree
    return jax.tree.map(lambda g: jax.lax.pmean(g, axis_name), tree)
