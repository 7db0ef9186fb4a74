"""Equivariant projection folding (cfg.equiv_fold, SURVEY §7.5).

The fold path must be:
* bitwise-identical on forwards: applying folded params through the
  project=False twin == applying raw params through the projecting module
  (both compute x @ W_eff.T + b_eff with the same W_eff);
* equal on gradients up to fp summation order (P is linear, so
  sum-then-project == project-then-sum), hence training trajectories track
  the reference-semantics path to fp noise over a few steps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.algos import ppo as ppo_lib
from gym_rotor_tpu.algos import replay
from gym_rotor_tpu.algos import sac as sac_lib
from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.models import ppo_models, sac_models, td3_models
from gym_rotor_tpu.models.emlp.nn import fast_twin, make_fold_fn
from gym_rotor_tpu.utils.config import Config


def _cfg(fold, mt="DTDE", **kw):
    return Config(framework="MODUL", module_training=mt, use_equiv=True,
                  equiv_fold=fold, **kw)


def _batch(cfg, n=8, key=0):
    rng = np.random.default_rng(key)
    obs = tuple(jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
                for d in cfg.obs_dim_n)
    act = tuple(jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
                for d in cfg.action_dim_n)
    rwd = tuple(jnp.asarray(rng.uniform(0, 1, (n, 1)), jnp.float32)
                for _ in cfg.obs_dim_n)
    done = tuple(jnp.zeros((n, 1), jnp.float32) for _ in cfg.obs_dim_n)
    return replay.Batch(obs=obs, act=act, rwd=rwd, next_obs=obs, done=done)


def _max_tree_diff(a, b):
    return max(jax.tree.leaves(jax.tree.map(
        lambda x, y: float(jnp.abs(x - y).max()), a, b)))


# ------------------------------------------------------------- forwards
@pytest.mark.parametrize("factory", [td3_models, sac_models, ppo_models])
def test_fold_forward_bitwise(factory):
    cfg = _cfg(False)
    defs = factory(cfg, 0)
    obs = jax.random.normal(jax.random.PRNGKey(1), (16, cfg.obs_dim_n[0]))
    p = defs.actor_def.init(jax.random.PRNGKey(0), obs[:1])
    ref = defs.actor_def.apply(p, obs)
    fold = defs.actor_fold(p)
    fast = defs.actor_fast.apply(fold, obs)
    for r, f in zip(jax.tree.leaves(ref), jax.tree.leaves(fast)):
        assert bool(jnp.all(r == f))


def test_fold_critic_forward_bitwise():
    cfg = _cfg(False)
    defs = td3_models(cfg, 0)
    obs = jax.random.normal(jax.random.PRNGKey(1), (16, cfg.obs_dim_n[0]))
    act = jax.random.normal(jax.random.PRNGKey(2), (16, cfg.action_dim_n[0]))
    p = defs.critic_def.init(jax.random.PRNGKey(0), obs[:1], act[:1])
    q1, q2 = defs.critic_def.apply(p, obs, act)
    f1, f2 = defs.critic_fast.apply(defs.critic_fold(p), obs, act)
    assert bool(jnp.all(q1 == f1)) and bool(jnp.all(q2 == f2))


def test_fold_gradients_match_projection_autodiff():
    """d/dW of (fold -> k dense forwards) equals d/dW of (k projecting
    forwards) up to fp summation order."""
    cfg = _cfg(False)
    defs = td3_models(cfg, 0)
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, cfg.obs_dim_n[0]))
    p = defs.actor_def.init(jax.random.PRNGKey(0), obs[:1])

    def loss_ref(q):
        return (defs.actor_def.apply(q, obs).sum()
                + defs.actor_def.apply(q, obs + 1.0).sum())

    def loss_fold(q):
        qf = defs.actor_fold(q)
        return (defs.actor_fast.apply(qf, obs).sum()
                + defs.actor_fast.apply(qf, obs + 1.0).sum())

    g_ref = jax.grad(loss_ref)(p)
    g_fold = jax.grad(loss_fold)(p)
    scale = max(jax.tree.leaves(jax.tree.map(
        lambda x: float(jnp.abs(x).max()), g_ref)))
    assert _max_tree_diff(g_ref, g_fold) < 1e-5 * max(scale, 1.0)


# ---------------------------------------------------------- train steps
@pytest.mark.parametrize("mt", ["DTDE", "CTDE"])
def test_td3_fold_training_tracks_reference(mt):
    results = {}
    for fold in (False, True):
        cfg = _cfg(fold, mt)
        agents = [td3_lib.TD3Agent(cfg, i, td3_models(cfg, i))
                  for i in range(cfg.n_agents)]
        states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
        step = jax.jit(lambda st, b, k, cfg=cfg, agents=agents:
                       td3_lib.train_step(cfg, agents, st, b, k))
        batch = _batch(cfg)
        key = jax.random.PRNGKey(7)
        for _ in range(3):  # 3 steps: the delayed actor branch fires
            key, sub = jax.random.split(key)
            states, metrics = step(states, batch, sub)
        results[fold] = (states, metrics)
    assert _max_tree_diff(results[False][0], results[True][0]) < 1e-5
    for k in results[False][1]:
        assert abs(float(results[False][1][k])
                   - float(results[True][1][k])) < 1e-5


def test_sac_fold_training_tracks_reference():
    results = {}
    for fold in (False, True):
        cfg = _cfg(fold, automatic_entropy_tuning=True)
        agents = [sac_lib.SACAgent(cfg, i, sac_models(cfg, i))
                  for i in range(cfg.n_agents)]
        states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
        step = jax.jit(lambda st, b, k, cfg=cfg, agents=agents:
                       sac_lib.train_step(cfg, agents, st, b, k))
        batch = _batch(cfg)
        states, _ = step(states, batch, jax.random.PRNGKey(7))
        results[fold] = states
    assert _max_tree_diff(results[False], results[True]) < 1e-5


def test_ppo_fold_training_tracks_reference():
    results = {}
    for fold in (False, True):
        cfg = _cfg(fold, T_horizon=32, K_epochs=2,
                   actor_batch_size=8, critic_batch_size=8)
        agents = [ppo_lib.PPOAgent(cfg, i, ppo_models(cfg, i))
                  for i in range(cfg.n_agents)]
        states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
        rng = np.random.default_rng(3)
        T = 32
        data = ppo_lib.Horizon(
            obs=tuple(jnp.asarray(rng.normal(size=(T, d)), jnp.float32)
                      for d in cfg.obs_dim_n),
            act=tuple(jnp.asarray(rng.uniform(-1, 1, (T, d)), jnp.float32)
                      for d in cfg.action_dim_n),
            rwd=tuple(jnp.asarray(rng.uniform(0, 1, (T, 1)), jnp.float32)
                      for _ in cfg.obs_dim_n),
            next_obs=tuple(jnp.asarray(rng.normal(size=(T, d)), jnp.float32)
                           for d in cfg.obs_dim_n),
            done=tuple(jnp.zeros((T, 1), jnp.float32)
                       for _ in cfg.obs_dim_n),
            logprob=tuple(jnp.asarray(rng.normal(size=(T, d)) * 0.1,
                                      jnp.float32)
                          for d in cfg.action_dim_n),
        )
        step = jax.jit(lambda st, d, k, cfg=cfg, agents=agents:
                       ppo_lib.train_step(cfg, agents, st, d, k))
        states, _ = step(states, data, jax.random.PRNGKey(7))
        results[fold] = states
    assert _max_tree_diff(results[False], results[True]) < 1e-5


def test_fold_noop_for_mlp_defs():
    """MLP ModelDefs carry no fold fns: fold_* degrade to identity and the
    apply defs stay the plain modules even with cfg.equiv_fold on."""
    cfg = Config(framework="MONO", use_equiv=False, equiv_fold=True)
    from gym_rotor_tpu.models import td3_models as factory
    agent = td3_lib.TD3Agent(cfg, 0, factory(cfg, 0))
    assert not agent.use_fold
    p = {"x": jnp.ones(3)}
    assert agent.fold_actor(p) is p
    assert agent.actor_apply_def is agent.defs.actor_def
