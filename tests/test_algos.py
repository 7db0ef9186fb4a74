"""Learner unit tests: replay semantics, TD3/SAC/PPO update mechanics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.algos import ppo as ppo_lib
from gym_rotor_tpu.algos import replay
from gym_rotor_tpu.algos import sac as sac_lib
from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.algos.common import cosine_warm_restarts
from gym_rotor_tpu.models import zoo
from gym_rotor_tpu.utils.config import Config


def mono_cfg(**kw):
    return Config(framework="MONO", use_equiv=False, **kw)


def modul_cfg(**kw):
    return Config(framework="MODUL", use_equiv=False, **kw)


def fake_batch(cfg, n=32, key=0):
    rng = np.random.default_rng(key)
    obs = tuple(jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
                for d in cfg.obs_dim_n)
    act = tuple(jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
                for d in cfg.action_dim_n)
    rwd = tuple(jnp.asarray(rng.uniform(0, 1, (n, 1)), jnp.float32)
                for _ in cfg.obs_dim_n)
    done = tuple(jnp.zeros((n, 1), jnp.float32) for _ in cfg.obs_dim_n)
    return replay.Batch(obs=obs, act=act, rwd=rwd, next_obs=obs, done=done)


# ---------------------------------------------------------------- replay
def test_replay_ring_wraparound():
    rs = replay.create(10, [3], [2])
    obs = jnp.arange(36, dtype=jnp.float32).reshape(12, 3)
    rs = replay.insert(rs, [obs[:6]], [jnp.zeros((6, 2))],
                       [jnp.zeros(6)], [obs[:6]], [jnp.zeros(6)])
    assert int(rs.ptr) == 6 and int(rs.filled) == 6
    rs = replay.insert(rs, [obs[6:12]], [jnp.ones((6, 2))],
                       [jnp.ones(6)], [obs[6:12]], [jnp.zeros(6)])
    assert int(rs.ptr) == 2 and int(rs.filled) == 10
    # rows 10, 11 wrapped to slots 0, 1
    np.testing.assert_array_equal(np.asarray(rs.obs[0][0]), np.asarray(obs[10]))
    np.testing.assert_array_equal(np.asarray(rs.obs[0][1]), np.asarray(obs[11]))


def test_replay_sample_shared_indices():
    rs = replay.create(100, [3, 2], [2, 1])
    n = 50
    o1 = jnp.arange(n, dtype=jnp.float32)[:, None] * jnp.ones((1, 3))
    o2 = jnp.arange(n, dtype=jnp.float32)[:, None] * jnp.ones((1, 2))
    rs = replay.insert(rs, [o1, o2], [jnp.zeros((n, 2)), jnp.zeros((n, 1))],
                       [jnp.zeros(n)] * 2, [o1, o2], [jnp.zeros(n)] * 2)
    b = replay.sample(rs, jax.random.PRNGKey(0), 16)
    # same transition index for both agents (CTDE alignment)
    np.testing.assert_array_equal(np.asarray(b.obs[0][:, 0]),
                                  np.asarray(b.obs[1][:, 0]))


def test_replay_sample_empty_buffer_is_poisoned():
    """Sampling before any insert is a driver bug: the batch must be
    NaN-poisoned (loud), not silently zero; after the first insert samples
    are clean again."""
    rs = replay.create(16, [3], [2])
    b = replay.sample(rs, jax.random.PRNGKey(0), 4)
    assert np.isnan(np.asarray(b.obs[0])).all()
    rs = replay.insert(rs, [jnp.ones((2, 3))], [jnp.zeros((2, 2))],
                       [jnp.zeros(2)], [jnp.ones((2, 3))], [jnp.zeros(2)])
    b = replay.sample(rs, jax.random.PRNGKey(0), 4)
    assert np.isfinite(np.asarray(b.obs[0])).all()


# ---------------------------------------------------------------- schedule
def test_cosine_warm_restarts_schedule():
    s = cosine_warm_restarts(3e-4, t0=1000, eta_min=1e-5)
    assert float(s(jnp.asarray(0))) == pytest.approx(3e-4)
    assert float(s(jnp.asarray(500))) == pytest.approx((3e-4 + 1e-5) / 2)
    assert float(s(jnp.asarray(1000))) == pytest.approx(3e-4)  # restart


# ---------------------------------------------------------------- TD3
@pytest.mark.parametrize("cfg", [
    mono_cfg(), modul_cfg(module_training="DTDE"),
    modul_cfg(module_training="CTDE"),
])
def test_td3_update_runs_and_changes_params(cfg):
    agents = [td3_lib.TD3Agent(cfg, i, zoo.td3_models(cfg, i))
              for i in range(cfg.n_agents)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    batch = fake_batch(cfg)
    step = jax.jit(lambda st, b, k: td3_lib.train_step(cfg, agents, st, b, k))
    crit_before = jax.tree.leaves(states[0].critic)[0].copy()
    act_before = jax.tree.leaves(states[0].actor)[0].copy()
    for it in range(3):
        states, metrics = step(states, batch, jax.random.PRNGKey(it))
    assert np.isfinite(float(metrics["agent0/critic_loss"]))
    # critic changed every step
    assert not np.allclose(np.asarray(jax.tree.leaves(states[0].critic)[0]),
                           np.asarray(crit_before))
    # actor updated at it=3 (policy_update_freq=3)
    assert not np.allclose(np.asarray(jax.tree.leaves(states[0].actor)[0]),
                           np.asarray(act_before))
    assert int(states[0].total_it) == 3


def test_td3_delayed_policy_update_gating():
    cfg = mono_cfg()
    agents = [td3_lib.TD3Agent(cfg, 0, zoo.td3_models(cfg, 0))]
    states = [agents[0].init(jax.random.PRNGKey(0))]
    batch = fake_batch(cfg)
    step = jax.jit(lambda st, b, k: td3_lib.train_step(cfg, agents, st, b, k))
    a0 = jax.tree.leaves(states[0].actor)[0].copy()
    states, _ = step(states, batch, jax.random.PRNGKey(0))  # it=1: no actor
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(states[0].actor)[0]), np.asarray(a0))
    states, _ = step(states, batch, jax.random.PRNGKey(1))  # it=2: no actor
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(states[0].actor)[0]), np.asarray(a0))
    states, _ = step(states, batch, jax.random.PRNGKey(2))  # it=3: update
    assert not np.allclose(
        np.asarray(jax.tree.leaves(states[0].actor)[0]), np.asarray(a0))


def test_static_gate_matches_runtime_cond():
    """gate_now=True/False (static branch placement) computes the same
    update as the runtime lax.cond path when the schedule matches
    total_it % freq.  Same math, but inlining the branch changes XLA's
    fusion grouping, so agreement is to fp summation order (measured max
    1 ulp over 6 chained updates), not bitwise."""
    cfg = mono_cfg()  # policy_update_freq = 3
    agents = [td3_lib.TD3Agent(cfg, 0, zoo.td3_models(cfg, 0))]
    s_cond = [agents[0].init(jax.random.PRNGKey(0))]
    s_stat = jax.tree.map(jnp.copy, s_cond)
    batch = fake_batch(cfg)
    step = jax.jit(
        lambda st, b, k, g: td3_lib.train_step(cfg, agents, st, b, k,
                                               gate_now=g),
        static_argnums=(3,))
    freq = cfg.policy_update_freq
    for it in range(6):
        k = jax.random.PRNGKey(it)
        s_cond, _ = step(s_cond, batch, k, None)
        s_stat, _ = step(s_stat, batch, k, (it + 1) % freq == 0)
    for a, b in zip(jax.tree.leaves(s_cond), jax.tree.leaves(s_stat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # SAC's delayed target-critic gate, same contract
    cfg_s = mono_cfg()
    ag = [sac_lib.SACAgent(cfg_s, 0, zoo.sac_models(cfg_s, 0))]
    c_cond = [ag[0].init(jax.random.PRNGKey(0))]
    c_stat = jax.tree.map(jnp.copy, c_cond)
    step_s = jax.jit(
        lambda st, b, k, g: sac_lib.train_step(cfg_s, ag, st, b, k,
                                               gate_now=g),
        static_argnums=(3,))
    for it in range(6):
        k = jax.random.PRNGKey(100 + it)
        c_cond, _ = step_s(c_cond, batch, k, None)
        c_stat, _ = step_s(c_stat, batch, k, (it + 1) % freq == 0)
    for a, b in zip(jax.tree.leaves(c_cond), jax.tree.leaves(c_stat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_td3_choose_action_bounds():
    cfg = mono_cfg()
    agent = td3_lib.TD3Agent(cfg, 0, zoo.td3_models(cfg, 0))
    state = agent.init(jax.random.PRNGKey(0))
    obs = jnp.ones((7, 23), jnp.float32)
    a = agent.choose_action(state, obs, 0.3, jax.random.PRNGKey(1))
    assert a.shape == (7, 4)
    assert float(jnp.abs(a).max()) <= 1.0
    # zero noise is deterministic
    a1 = agent.choose_action(state, obs, 0.0, jax.random.PRNGKey(2))
    a2 = agent.choose_action(state, obs, 0.0, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


# ---------------------------------------------------------------- SAC
@pytest.mark.parametrize("auto_alpha", [False, True])
def test_sac_update_runs(auto_alpha):
    cfg = mono_cfg(automatic_entropy_tuning=auto_alpha)
    agents = [sac_lib.SACAgent(cfg, 0, zoo.sac_models(cfg, 0))]
    states = [agents[0].init(jax.random.PRNGKey(0))]
    batch = fake_batch(cfg)
    step = jax.jit(lambda st, b, k: sac_lib.train_step(cfg, agents, st, b, k))
    for it in range(3):
        states, metrics = step(states, batch, jax.random.PRNGKey(it))
    assert np.isfinite(float(metrics["agent0/critic_loss"]))
    assert np.isfinite(float(metrics["agent0/actor_loss"]))
    if auto_alpha:
        assert float(metrics["agent0/alpha"]) != cfg.sac_alpha
    else:
        assert float(metrics["agent0/alpha"]) == pytest.approx(cfg.sac_alpha)


def test_sac_sample_logprob_correctness():
    """tanh-squashed log-prob vs direct numerical computation."""
    from gym_rotor_tpu.models import mlp
    mean = jnp.array([[0.3, -0.5]])
    log_std = jnp.array([[-1.0, 0.2]])
    a, lp, det = mlp.sac_sample(mean, log_std, jax.random.PRNGKey(0))
    assert a.shape == (1, 2) and lp.shape == (1, 1)
    assert float(jnp.abs(a).max()) < 1.0
    np.testing.assert_allclose(np.asarray(det), np.tanh(mean), rtol=1e-6)
    # recompute log prob manually
    x_t = np.arctanh(np.asarray(a))
    std = np.exp(log_std)
    normal_lp = (-0.5 * ((x_t - mean) / std) ** 2 - log_std
                 - 0.5 * np.log(2 * np.pi))
    corr = normal_lp - np.log(1 - np.asarray(a) ** 2 + 1e-6)
    np.testing.assert_allclose(np.asarray(lp), corr.sum(-1, keepdims=True),
                               rtol=1e-4)


# ---------------------------------------------------------------- PPO
def test_ppo_gae_matches_reference_recursion():
    cfg = mono_cfg()
    T = 50
    rng = np.random.default_rng(0)
    r = rng.uniform(0, 1, (T, 1)).astype(np.float32)
    v = rng.normal(size=(T, 1)).astype(np.float32)
    nv = rng.normal(size=(T, 1)).astype(np.float32)
    d = (rng.uniform(size=(T, 1)) < 0.05).astype(np.float32)
    advs, tds = ppo_lib.gae(cfg, jnp.asarray(v), jnp.asarray(nv),
                            jnp.asarray(r), jnp.asarray(d))
    # reference backward loop (ppo.py:134-146)
    deltas = r + cfg.discount * nv * (1 - d) - v
    ref = [0.0]
    for delta, done in zip(deltas[::-1, 0], d[::-1, 0]):
        ref.append(delta + cfg.discount * (1 - done) * cfg.GAE_lambda * ref[-1])
    ref = np.array(ref[1:][::-1], dtype=np.float32)[:, None]
    ref_td = ref + v
    ref_norm = (ref - ref.mean()) / (ref.std(ddof=1) + 1e-4)  # torch std semantics
    np.testing.assert_allclose(np.asarray(tds), ref_td, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(advs), ref_norm, rtol=1e-3,
                               atol=1e-4)


@pytest.mark.parametrize("cfg", [
    mono_cfg(T_horizon=64, K_epochs=2, actor_batch_size=16,
             critic_batch_size=16),
    modul_cfg(module_training="CTDE", T_horizon=64, K_epochs=2,
              actor_batch_size=16, critic_batch_size=16),
])
def test_ppo_update_runs(cfg):
    agents = [ppo_lib.PPOAgent(cfg, i, zoo.ppo_models(cfg, i))
              for i in range(cfg.n_agents)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    T = cfg.T_horizon
    rng = np.random.default_rng(1)
    data = ppo_lib.Horizon(
        obs=tuple(jnp.asarray(rng.normal(size=(T, d)), jnp.float32)
                  for d in cfg.obs_dim_n),
        act=tuple(jnp.asarray(rng.uniform(-1, 1, (T, d)), jnp.float32)
                  for d in cfg.action_dim_n),
        rwd=tuple(jnp.asarray(rng.uniform(0, 1, (T, 1)), jnp.float32)
                  for _ in cfg.obs_dim_n),
        next_obs=tuple(jnp.asarray(rng.normal(size=(T, d)), jnp.float32)
                       for d in cfg.obs_dim_n),
        done=tuple(jnp.zeros((T, 1), jnp.float32) for _ in cfg.obs_dim_n),
        logprob=tuple(jnp.asarray(rng.normal(size=(T, d)), jnp.float32) * 0.1
                      for d in cfg.action_dim_n),
    )
    step = jax.jit(lambda st, dd, k: ppo_lib.train_step(cfg, agents, st, dd, k))
    a0 = jax.tree.leaves(states[0].actor)[0].copy()
    states, metrics = step(states, data, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["agent0/actor_loss"]))
    assert np.isfinite(float(metrics["agent0/critic_loss"]))
    assert not np.allclose(np.asarray(jax.tree.leaves(states[0].actor)[0]),
                           np.asarray(a0))
    # entropy coef decayed once per train call (ppo.py:149)
    assert float(states[0].entropy_coef) == pytest.approx(
        cfg.entropy_coef * cfg.entropy_coef_decay)


@pytest.mark.parametrize("framework", ["MONO", "MODUL"])
def test_insert_tick_scan_matches_staged_rollout(framework):
    """The fused in-scan ring write (replay.insert_tick inside the superstep
    rollout, train_step.py) must leave the ring bitwise-identical to the
    staged path (batch.rollout stack -> insert_rollout) for the same key
    stream — same rows, same order, same cursor."""
    from gym_rotor_tpu.envs import batch as batch_lib

    cfg = Config(framework=framework, use_equiv=False, num_envs=8,
                 replay_buffer_size=128, max_steps=32)
    act_total = sum(cfg.action_dim_n)
    bstate, obs = batch_lib.batched_reset(cfg, jax.random.PRNGKey(0))
    rs0 = replay.create(cfg.replay_buffer_size, cfg.obs_dim_n,
                        cfg.action_dim_n)

    def policy(_, ob, k):
        return jax.random.uniform(k, (ob[0].shape[0], act_total),
                                  jnp.float32, -1.0, 1.0)

    T = 6
    key = jax.random.PRNGKey(42)

    # staged: stack the rollout, then one bulk scatter
    _, _, trs, _ = batch_lib.rollout(cfg, bstate, obs, key, policy, None, T)
    rs_staged = replay.insert_rollout(rs0, trs)

    # fused: per-tick scatter inside the scan (superstep roll_body shape)
    def body(carry, _):
        bs, ob, rs, k = carry
        k, sub = jax.random.split(k)
        actions = policy(None, ob, sub)
        bs, out = batch_lib.batched_step(cfg, bs, actions)
        rs = replay.insert_tick(rs, ob, actions, out.reward,
                                out.info["terminal_obs"], out.done)
        return (bs, out.obs, rs, k), None

    (_, _, rs_fused, _), _ = jax.lax.scan(
        body, (bstate, obs, rs0, key), None, length=T)

    assert int(rs_fused.ptr) == int(rs_staged.ptr) == T * 8
    assert int(rs_fused.filled) == int(rs_staged.filled)
    for a, b in zip(jax.tree.leaves(rs_fused), jax.tree.leaves(rs_staged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_insert_tick_wraparound_keeps_newest():
    """Per-tick inserts must wrap the cursor modulo capacity and retain the
    newest rows (the staged bulk insert requires T*B <= capacity; the fused
    path only needs B <= capacity)."""
    cfg = Config(framework="MONO", use_equiv=False, num_envs=4,
                 replay_buffer_size=8, max_steps=32)
    rs = replay.create(8, cfg.obs_dim_n, cfg.action_dim_n)
    for t in range(5):  # 20 rows through a cap-8 ring
        obs = (jnp.full((4, 23), float(t)),)
        act = jnp.full((4, 4), float(t))
        rwd = jnp.full((4, 1), float(t))
        done = jnp.zeros((4, 1))
        rs = replay.insert_tick(rs, obs, act, rwd, obs, done)
    assert int(rs.ptr) == 20 % 8
    assert int(rs.filled) == 8
    # ring holds exactly ticks 3 and 4 (rows 12..19), wrapped
    vals = np.asarray(rs.obs[0])[:, 0]
    assert sorted(vals.tolist()) == [3.0] * 4 + [4.0] * 4


def test_batched_spectral_norm_matches_per_matrix_oracle():
    """The batched (padded+stacked) spectral regularizer must equal the
    per-matrix power iteration it replaced — same fold_in(key, i) x0 draws,
    same 10-step dynamics (padding is exact, see regularizers.py) — in value
    and gradient."""
    from gym_rotor_tpu.algos import regularizers as R

    key = jax.random.PRNGKey(3)
    shapes = [(16, 25), (62, 67), (4, 7), (62, 62), (1, 62)]
    ws = [jax.random.normal(jax.random.fold_in(key, 100 + i), s)
          for i, s in enumerate(shapes)]
    extras = [jax.random.normal(jax.random.fold_in(key, 200), (33,))]

    def solo(weights, k, ex):
        total = 0.0
        for i, W in enumerate(weights):
            total = total + R.approx_spectral_norm(
                W, jax.random.fold_in(k, i)) ** 2
        for e in ex:
            total = total + jnp.sum(e * e)
        return total

    a = float(solo(ws, key, extras))
    b = float(R.spectral_norm_regularization(ws, key, extras))
    assert abs(a - b) / abs(a) < 1e-6
    ga = jax.grad(lambda w: solo(w, key, extras))(ws)
    gb = jax.grad(lambda w: R.spectral_norm_regularization(w, key, extras))(ws)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)
