"""Shared learner plumbing: optimizers, schedules, target updates.

Flat update path: every learner differentiates its loss with respect to the
RAVELED parameter vector (jax.flatten_util.ravel_pytree) and runs the
optimizer + Polyak chains on that single array.  AdamW/clipping are
elementwise/global-norm transforms, so the math is identical to the per-leaf
tree form (global norm is the same sum either way, up to fp reduction
order); what changes is the compiled op count — one ~15-op optimizer chain
per network instead of ~15 ops *per parameter leaf* (the flagship EMLP
agents carry 8-16 leaves per net x 4 nets x 2 agents, which made the
optimizer/Polyak chains the single largest slice of the learner update's
~4.4k-instruction HLO, scripts/update_path_probe.py).  The ravel/unravel
are pure layout ops (reshape/concat/slice) that XLA fuses into the
neighboring elementwise work.  Under data parallelism the gradient pmean
also becomes ONE all-reduce per network instead of one per leaf.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


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


def flat_init(tx: optax.GradientTransformation, params):
    """Optimizer state over the raveled parameter vector (flat update
    path, module docstring)."""
    return tx.init(ravel_pytree(params)[0])


def flat_polyak(target_tree, flat_new, tau: float, unravel):
    """soft_update expressed on the raveled vectors: 3 ops total instead of
    3 per leaf.  ``flat_new`` is the freshly-updated flat parameter vector
    (already in hand at every call site); the target tree is raveled here."""
    flat_t, _ = ravel_pytree(target_tree)
    return unravel(tau * flat_new + (1.0 - tau) * flat_t)


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def pmean_if(tree, axis_name):
    """pmean-reduce a gradient pytree when running inside shard_map/pmap
    over ``axis_name`` (None = single-device no-op)."""
    if axis_name is None:
        return tree
    return jax.tree.map(lambda g: jax.lax.pmean(g, axis_name), tree)
