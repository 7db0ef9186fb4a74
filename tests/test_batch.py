"""Batched env tests: auto-reset semantics, lockstep rollout, shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from gym_rotor_tpu.envs import batch
from gym_rotor_tpu.utils.config import Config


def test_batched_reset_shapes():
    cfg = Config(framework="MODUL", num_envs=32)
    bs, obs = batch.batched_reset(cfg, jax.random.PRNGKey(0))
    assert obs[0].shape == (32, 15)
    assert obs[1].shape == (32, 3)
    assert bs.env.x.shape == (32, 3)
    assert bs.env.params.m.shape == (32,)  # per-env randomized params
    # UDM params actually vary across envs
    assert float(jnp.std(bs.env.params.m)) > 1e-3


def test_batched_step_and_autoreset():
    cfg = Config(framework="MONO", num_envs=64, max_steps=50)
    key = jax.random.PRNGKey(1)
    bs, obs = batch.batched_reset(cfg, key)
    step = jax.jit(lambda b, a: batch.batched_step(cfg, b, a))
    # wild random actions to provoke crashes
    rng = np.random.default_rng(0)
    saw_reset = False
    for i in range(60):
        acts = jnp.asarray(rng.uniform(-1, 1, (64, 4)), jnp.float32)
        bs, out = step(bs, acts)
        if bool(out.reset_happened.any()):
            saw_reset = True
            # reset envs must be back in bounds with t=0
            idx = np.asarray(out.reset_happened)
            t = np.asarray(bs.env.t)
            assert (t[idx] == 0).all()
            x = np.asarray(bs.env.x)
            assert (np.abs(x[idx]) <= 0.6 + 1e-6).all()
    assert saw_reset
    # episode cap enforced: t never exceeds max_steps
    assert int(bs.env.t.max()) <= cfg.max_steps


def test_episode_cap_records_solved_done():
    """At the cap, the recorded done is the solved criterion, not a crash
    (reference main.py:169-173)."""
    cfg = Config(framework="MONO", num_envs=4, max_steps=5, use_UDM=False)
    bs, obs = batch.batched_reset(cfg, jax.random.PRNGKey(2), "eval")
    # hover actions on eval reset (small initial offsets, no velocity):
    p = bs.env.params
    a0 = (p.m * 9.81 / 4 - p.avrg_act) / p.scale_act
    acts = jnp.stack([a0, jnp.zeros_like(a0), jnp.zeros_like(a0),
                      jnp.zeros_like(a0)], axis=-1)
    step = jax.jit(lambda b, a: batch.batched_step(cfg, b, a, "eval"))
    for i in range(5):
        bs, out = step(bs, acts)
    # all envs hit the cap at step 5 -> episode over everywhere
    assert bool(out.reset_happened.all())
    # hovering quads hold |ex| ~ initial offset (<= 0.4 m) > 0.03 -> not
    # solved; done recorded False (bootstrap continues), no crash
    assert not bool(out.done.any())
    assert not bool(out.info["crashed"].any())


def test_rollout_scan_transitions():
    cfg = Config(framework="MODUL", num_envs=16, max_steps=100)
    bs, obs = batch.batched_reset(cfg, jax.random.PRNGKey(3))

    def policy(_, ob, key):
        return jax.random.uniform(key, (16, 5), jnp.float32, -0.3, 0.3)

    roll = jax.jit(lambda b, o, k: batch.rollout(cfg, b, o, k, policy, None, 20))
    bs2, obs2, trs, outs = roll(bs, obs, jax.random.PRNGKey(4))
    assert trs.obs[0].shape == (20, 16, 15)
    assert trs.obs[1].shape == (20, 16, 3)
    assert trs.action.shape == (20, 16, 5)
    assert trs.reward.shape == (20, 16, 2)
    assert trs.done.shape == (20, 16, 2)
    # rewards bounded in [-1, 1] ([0,1] unless crash)
    r = np.asarray(trs.reward)
    assert ((r >= -1.0) & (r <= 1.0)).all()
    # first-step obs in the transitions equal the reset obs
    np.testing.assert_array_equal(np.asarray(trs.obs[0][0]), np.asarray(obs[0]))


def test_end_to_end_training_determinism():
    """Same seed => bit-identical learner params after rollout+updates
    (fixed-seed reproducibility, the property the reference gets from
    global seeding, utils/utils.py:8-18)."""
    import numpy as np
    from gym_rotor_tpu.algos import replay as replay_lib
    from gym_rotor_tpu.algos import td3 as td3_lib
    from gym_rotor_tpu.models import td3_models

    cfg = Config(framework="MONO", use_equiv=False, num_envs=8,
                 replay_buffer_size=256, batch_size=16, max_steps=32)

    def run():
        agents = [td3_lib.TD3Agent(cfg, 0, td3_models(cfg, 0))]
        states = [agents[0].init(jax.random.PRNGKey(0))]
        rs = replay_lib.create(cfg.replay_buffer_size, cfg.obs_dim_n,
                               cfg.action_dim_n)
        bs, obs = batch.batched_reset(cfg, jax.random.PRNGKey(1))

        def policy(ps, ob, k):
            return agents[0].choose_action(ps[0], ob[0], 0.2, k)

        @jax.jit
        def superstep(bs, obs, rs, states, key):
            k1, k2, k3 = jax.random.split(key, 3)
            bs, obs, trs, _ = batch.rollout(cfg, bs, obs, k1, policy,
                                            states, 8)
            rs = replay_lib.insert_rollout(rs, trs)
            b = replay_lib.sample(rs, k2, cfg.batch_size)
            states, _ = td3_lib.train_step(cfg, agents, states, b, k3)
            return bs, obs, rs, states

        for it in range(3):
            bs, obs, rs, states = superstep(bs, obs, rs, states,
                                            jax.random.PRNGKey(10 + it))
        return states

    s1, s2 = run(), run()
    for a, b in zip(jax.tree.leaves(s1[0]), jax.tree.leaves(s2[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))




def test_rollout_unroll_equivalence():
    """Explicit scan unroll must leave discrete state bit-identical and
    float leaves within the documented jit FMA-contraction class (<= a few
    ulp f32) of the unroll=1 rollout — the contract scan_unroll's chip
    default relies on (envs/batch.py, DESIGN §1.5)."""
    cfg = Config(framework="MONO", integrator="rk4", num_envs=64,
                 max_steps=50)
    bs, obs = jax.jit(lambda k: batch.batched_reset(cfg, k))(
        jax.random.PRNGKey(0))

    def pol(_, ob, key):
        return jax.random.uniform(key, (64, 4), jnp.float32, -0.2, 0.2)

    def run(unroll):
        return jax.jit(lambda b, o, k: batch.rollout(
            cfg, b, o, k, pol, None, 40, unroll=unroll))(
                bs, obs, jax.random.PRNGKey(1))

    o1, o4 = run(1), run(4)
    for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o4)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=0, atol=5e-6)
        else:
            np.testing.assert_array_equal(a, b)
