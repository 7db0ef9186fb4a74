"""Actor-loss regularizers: CAPS action smoothness + spectral norm.

* ``caps_regularization`` — temporal/spatial/magnitude smoothness terms added
  to the actor loss (reference algos/policy_regularization.py:6-52):
  lam_T ||pi(s) - pi(s')||^2 + lam_S ||pi(s) - pi(s + eps)||^2 (eps a single
  N(0, 0.05^2) vector broadcast over the batch, :20-21) +
  lam_M ||pi(s) - a_hover||^2 with the per-framework nominal hover action
  (:30-47).
* ``spectral_norm_regularization`` — power-iteration estimate of each
  layer's top singular value, summed squared (reference
  algos/spectral_norm_regularization.py:4-45); weighted 1e-5 (actors) /
  1e-8 (critics) / 1e-10 (PPO critics) by the callers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..envs import params as params_lib


def hover_action_scalar(p=None) -> float:
    """Normalized hover total-thrust action: interp(4*hover_force,
    [4*min, 4*max], [-1, 1]) (policy_regularization.py:31-34).  Uses nominal
    parameters — the reference reads the env's *current* randomized values; at
    TPU batch scale the per-episode params differ per env, and the UDM
    distribution is centered on nominal.

    Quantified divergence: under +-10% UDM on (m, c_tw) the per-env hover
    scalar spans [-0.227, -0.035] around the nominal -0.140 (max dev 0.105),
    so the magnitude target differs by <=0.105 in action units, scaled by
    lam_M=0.1 inside one of three CAPS terms — third-order relative to the
    actor loss.  Note the reference's own semantics are already approximate:
    it applies the constants of the env at *update* time to a replay batch
    drawn from episodes with different constants."""
    hover = params_lib.M_NOMINAL * params_lib.G_STD / 4.0
    lo = params_lib.MIN_FORCE
    hi = params_lib.C_TW_NOMINAL * hover
    return float((hover - lo) / (hi - lo) * 2.0 - 1.0)


def nominal_action(framework: str, agent_id: int, batch: int, action_dim: int,
                   dtype=jnp.float32):
    """Per-framework hover-nominal action (policy_regularization.py:30-47)."""
    a = jnp.zeros((batch, action_dim), dtype)
    if framework == "MONO" or (framework == "MODUL" and agent_id == 0):
        a = a.at[:, 0].set(hover_action_scalar())
    # MODUL agent 1: zeros (M3_hover = 0)
    return a


def caps_noise(cfg, key, obs):
    """The spatial-smoothness perturbation: ONE N(0, 0.05^2) obs-dim vector
    broadcast over the batch (policy_regularization.py:20-21)."""
    return 0.05 * jax.random.normal(key, (1, obs.shape[-1]), obs.dtype)


def caps_terms(cfg, agent_id, act, act_next, act_pert):
    """lam_T*L_T + lam_S*L_S + lam_M*L_M from pre-computed (already clipped)
    actions — the fused form: callers evaluate the actor ONCE on
    concat([obs, obs_next, obs + caps_noise]) along the batch axis and split,
    turning CAPS's three actor forwards into one (identical per-row math:
    the nets are row-independent)."""
    loss_T = jnp.mean((act - act_next) ** 2)
    loss_S = jnp.mean((act - act_pert) ** 2)
    nominal = nominal_action(cfg.framework, agent_id, act.shape[0],
                             act.shape[-1], act.dtype)
    loss_M = jnp.mean((act - nominal) ** 2)
    return cfg.lam_T * loss_T + cfg.lam_S * loss_S + cfg.lam_M * loss_M


def caps_regularization(cfg, agent_id, act_fn, batch_obs, batch_obs_next,
                        key):
    """Return lam_T*L_T + lam_S*L_S + lam_M*L_M for the given actor callable
    ``act_fn(obs) -> action in [-1,1]`` (already clamped by caller)."""
    act = jnp.clip(act_fn(batch_obs), -cfg.max_action, cfg.max_action)
    act_next = jnp.clip(act_fn(batch_obs_next), -cfg.max_action,
                        cfg.max_action)
    noise = caps_noise(cfg, key, batch_obs)
    act_pert = jnp.clip(act_fn(batch_obs + noise), -cfg.max_action,
                        cfg.max_action)
    return caps_terms(cfg, agent_id, act, act_next, act_pert)


def approx_spectral_norm(W, key, iters: int = 10):
    """Power iteration on WᵀW (spectral_norm_regularization.py:4-26).

    The iterate is ``stop_gradient``-ed before the final matvec (see
    ``spectral_norm_regularization`` for the envelope-theorem argument);
    the returned VALUE is bit-identical to differentiating through the
    chain."""
    x = jax.random.normal(key, (W.shape[-1],), W.dtype)

    def body(_, x):
        x = W.T @ (W @ x)
        return x / jnp.linalg.norm(x)

    x = jax.lax.stop_gradient(jax.lax.fori_loop(0, iters, body, x))
    return jnp.linalg.norm(W @ x)


def spectral_norm_regularization(weights, key, extras=(), iters: int = 10):
    """Sum of squared spectral norms over a list of weight matrices plus
    squared Frobenius norms of extra parameter tensors (the EMLP bilinear
    params, spectral_norm_regularization.py:41-44).

    TPU redesign: the reference (and our first version) power-iterates each
    weight *separately* — K matrices x 10 iterations x 2 matvecs + a norm,
    all sequential, which dominated the learner update's serial op count
    once everything else fused (~3.7k-instruction HLO, scripts/
    update_path_probe.py).  Here the matrices are zero-padded to a common
    shape and stacked, so the whole regularizer is ONE 10-step chain of
    batched (K, mo, mi) matvecs.  Padding is exact, not approximate: with W
    zero-padded, y = Wᵀ(Wx) has zeros in every padded coordinate after the
    first iteration and the padded coordinates of x0 never influence the
    unpadded block, so each matrix's iterates equal its solo iterates
    (x0 is drawn per-matrix at its true size from the same fold_in(key, i)
    stream as before — values differ only by fp reduction order of the
    norms)."""
    total = 0.0
    if weights:
        K = len(weights)
        mo = max(int(W.shape[0]) for W in weights)
        mi = max(int(W.shape[1]) for W in weights)
        Ws = jnp.stack([
            jnp.pad(W, ((0, mo - W.shape[0]), (0, mi - W.shape[1])))
            for W in weights])                              # (K, mo, mi)
        x = jnp.stack([
            jnp.pad(jax.random.normal(jax.random.fold_in(key, i),
                                      (W.shape[1],), W.dtype),
                    (0, mi - W.shape[1]))
            for i, W in enumerate(weights)])                # (K, mi)

        # statically unrolled: a lax loop would keep each tiny batched
        # matvec pair in its own sequential iteration (plus per-iteration
        # loop overhead in forward AND backward); unrolled, XLA schedules
        # the whole chain as straight-line code
        for _ in range(iters):
            y = jnp.einsum("kij,kj->ki", Ws, x)             # (K, mo)
            x = jnp.einsum("kij,ki->kj", Ws, y)             # (K, mi)
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        # Gradient divergence (documented): the reference backprops through
        # the whole power chain (spectral_norm_regularization.py:19-23 has
        # no detach), we stop_gradient the converged iterate v and
        # differentiate only sigma = |W v|.  At convergence these agree
        # EXACTLY: v maximizes |Wv| on the unit sphere, so the tangential
        # derivative through v vanishes (envelope theorem) and
        # d(sigma^2)/dW = 2 sigma u v^T either way; the difference is
        # O((lambda2/lambda1)^(2*iters)) non-convergence residual on a term
        # weighted 1e-5/1e-8.  The VALUE is bit-identical; the backward
        # drops ~3x the chain's matvecs (20 tiny sequential einsums whose
        # transposes dominated the regularizer's cost, round-4 probe).
        x = jax.lax.stop_gradient(x)
        sigma = jnp.linalg.norm(jnp.einsum("kij,kj->ki", Ws, x), axis=-1)
        total = total + jnp.sum(sigma * sigma)
    for e in extras:
        total = total + jnp.sum(e * e)
    return total
