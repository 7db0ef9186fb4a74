"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: DP-sharded rollout/learner steps testable without a cluster)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.algos import ppo as ppo_lib
from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.models import ppo_models, td3_models
from gym_rotor_tpu.parallel import mesh as mesh_lib
from gym_rotor_tpu.parallel.train_step import (init_ep_ret,
                                               make_sharded_ppo_superstep,
                                               make_sharded_td3_superstep,
                                               sharded_init)
from gym_rotor_tpu.utils.config import Config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_sharded_td3_superstep_runs_and_syncs():
    cfg = Config(framework="MODUL", module_training="DTDE", use_equiv=False,
                 num_envs=16, replay_buffer_size=512, batch_size=32,
                 max_steps=64, start_timesteps=0)
    mesh = mesh_lib.make_mesh(8)
    agents = [td3_lib.TD3Agent(cfg, i, td3_models(cfg, i)) for i in range(2)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]

    bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(0))
    ep_ret = init_ep_ret(cfg, mesh)
    assert bstate.env.x.sharding.spec == jax.sharding.PartitionSpec("env")

    step = make_sharded_td3_superstep(cfg, agents, mesh, rollout_len=4,
                                      n_updates=2)
    for it in range(3):
        bstate, obs, rstate, states, ep_ret, metrics = step(
            bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(10 + it),
            0.1)
    assert np.isfinite(float(metrics["agent0/critic_loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))
    # replay advanced: 3 supersteps * 4 ticks * (16/8 envs per device)
    assert int(rstate.filled) == 3 * 4 * 2
    # params stayed replicated and finite
    w = jax.tree.leaves(states[0].actor)[0]
    assert np.isfinite(np.asarray(w)).all()


def test_sharded_warm_variant_skips_updates():
    """warm=True must act with uniform-random actions and leave the learner
    untouched (reference start_timesteps warmup, main.py:154-155)."""
    cfg = Config(framework="MONO", use_equiv=False, num_envs=8,
                 replay_buffer_size=256, batch_size=16, max_steps=32)
    mesh = mesh_lib.make_mesh(8)
    agents = [td3_lib.TD3Agent(cfg, 0, td3_models(cfg, 0))]
    states = [agents[0].init(jax.random.PRNGKey(0))]
    states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
    bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(1))
    ep_ret = init_ep_ret(cfg, mesh)
    step = make_sharded_td3_superstep(cfg, agents, mesh, rollout_len=3,
                                      n_updates=2)
    before = jax.tree.map(np.asarray, states[0].actor)
    bstate, obs, rstate, states, ep_ret, metrics = step(
        bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(2), 0.1,
        warm=True)
    after = jax.tree.map(np.asarray, states[0].actor)
    jax.tree.map(np.testing.assert_array_equal, before, after)
    assert int(states[0].total_it) == 0
    assert "agent0/critic_loss" not in metrics       # warm metrics: episode stats only
    assert int(rstate.filled) == 3 * 1               # replay still fills
    assert np.isfinite(float(metrics["mean_reward"]))


def test_sharded_sac_superstep_runs():
    """SAC inside the off-policy superstep: sampled-action act_fn (folded
    once per chunk via act_prep) + sac train_fn with pmean'd gradients
    (reference sac.py:108-223 semantics at scale)."""
    from gym_rotor_tpu.algos import sac as sac_lib
    from gym_rotor_tpu.models import sac_models

    cfg = Config(framework="MODUL", module_training="DTDE", rl_algo="SAC",
                 use_equiv=False, num_envs=16, replay_buffer_size=512,
                 batch_size=32, max_steps=64, automatic_entropy_tuning=True)
    mesh = mesh_lib.make_mesh(8)
    agents = [sac_lib.SACAgent(cfg, i, sac_models(cfg, i)) for i in range(2)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
    bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(0))
    ep_ret = init_ep_ret(cfg, mesh)

    def act_prep(sts):
        return [a.fold_actor(sts[i].actor) for i, a in enumerate(agents)]

    def act_fn(folded, ob, noise_std, k):
        acts = []
        for i, a in enumerate(agents):
            k, sub = jax.random.split(k)
            acts.append(a.choose_action_f(folded[i], ob[i], sub))
        return jnp.concatenate(acts, axis=-1)

    step = make_sharded_td3_superstep(
        cfg, agents, mesh, rollout_len=4, n_updates=2,
        train_fn=sac_lib.train_step, act_fn=act_fn, act_prep=act_prep)
    for it in range(2):
        bstate, obs, rstate, states, ep_ret, metrics = step(
            bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(30 + it),
            0.1)
    assert np.isfinite(float(metrics["agent0/critic_loss"]))
    assert np.isfinite(float(metrics["agent0/alpha"]))
    assert int(states[0].total_it) == 2 * 2
    assert int(rstate.filled) == 2 * 4 * 2
    w = jax.tree.leaves(states[0].actor)[0]
    assert np.isfinite(np.asarray(w)).all()


def test_sharded_ppo_superstep_runs():
    """On-policy superstep: T_horizon rollout + GAE + K-epoch minibatches
    with pmean'd gradients, all inside one shard_map program."""
    cfg = Config(framework="MODUL", module_training="DTDE", rl_algo="PPO",
                 use_equiv=False, num_envs=16, max_steps=64,
                 T_horizon=64, K_epochs=2, actor_batch_size=16,
                 critic_batch_size=16)
    mesh = mesh_lib.make_mesh(8)
    agents = [ppo_lib.PPOAgent(cfg, i, ppo_models(cfg, i)) for i in range(2)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
    bstate, obs, _ = sharded_init(cfg, mesh, jax.random.PRNGKey(0),
                                  with_replay=False)
    ep_ret = init_ep_ret(cfg, mesh)
    step = make_sharded_ppo_superstep(cfg, agents, mesh,
                                      rollout_len=cfg.T_horizon // cfg.num_envs)
    for it in range(2):
        bstate, obs, states, ep_ret, metrics = step(
            bstate, obs, states, ep_ret, jax.random.PRNGKey(5 + it))
    assert np.isfinite(float(metrics["agent0/actor_loss"]))
    assert np.isfinite(float(metrics["agent1/critic_loss"]))
    assert int(states[0].total_it) == 2
    # params finite and replicated
    w = jax.tree.leaves(states[0].actor)[0]
    assert np.isfinite(np.asarray(w)).all()


def _bit_identical_across_devices(arr):
    """Replication must be exact: every device's shard of a replicated array
    holds the same bits."""
    shards = [np.asarray(s.data) for s in arr.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_sharded_td3_emlp_flagship_superstep_runs_and_syncs():
    """The FLAGSHIP model family (MODUL-EMLP-DTDE, reference
    algos/td3/td3_emlp.py:38-43,161-163,215-217) under the sharded
    superstep: equivariant actors/critics + fold mode, pmean'd gradients,
    params bit-identically replicated after multiple supersteps."""
    cfg = Config(framework="MODUL", module_training="DTDE", use_equiv=True,
                 equiv_fold=True, num_envs=16, replay_buffer_size=512,
                 batch_size=32, max_steps=64, start_timesteps=0)
    mesh = mesh_lib.make_mesh(8)
    agents = [td3_lib.TD3Agent(cfg, i, td3_models(cfg, i)) for i in range(2)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
    bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(0))
    ep_ret = init_ep_ret(cfg, mesh)
    step = make_sharded_td3_superstep(cfg, agents, mesh, rollout_len=2,
                                      n_updates=2)
    for it in range(2):
        bstate, obs, rstate, states, ep_ret, metrics = step(
            bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(40 + it),
            0.1)
    assert np.isfinite(float(metrics["agent0/critic_loss"]))
    assert np.isfinite(float(metrics["agent1/critic_loss"]))
    assert int(states[0].total_it) == 2 * 2
    # HLO census: all-reduces only — the EMLP projection (baked dense
    # projector constants) must not smuggle in any resharding collective
    hlo = step.jitted[False].lower(
        bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(9),
        jnp.asarray(0.1, jnp.float32)).compile().as_text()
    assert hlo.count("all-reduce") > 0
    assert _collective_census(hlo) == {
        "all-gather": 0, "all-to-all": 0, "collective-permute": 0,
        "reduce-scatter": 0}
    # params replicated bit-identically on every device (both agents,
    # actor + critic): pmean'd grads + identical optimizer math
    for st in states:
        for tree in (st.actor, st.critic):
            w = jax.tree.leaves(tree)[0]
            assert w.sharding.is_fully_replicated
            _bit_identical_across_devices(w)


def test_sharded_sac_emlp_superstep_runs():
    """Second use_equiv=True multichip case: SAC with equivariant
    actors/critics (fold off — projecting in every forward) through the
    same off-policy superstep."""
    from gym_rotor_tpu.algos import sac as sac_lib
    from gym_rotor_tpu.models import sac_models

    cfg = Config(framework="MODUL", module_training="DTDE", rl_algo="SAC",
                 use_equiv=True, num_envs=16, replay_buffer_size=512,
                 batch_size=32, max_steps=64, automatic_entropy_tuning=True)
    mesh = mesh_lib.make_mesh(8)
    agents = [sac_lib.SACAgent(cfg, i, sac_models(cfg, i)) for i in range(2)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
    bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(0))
    ep_ret = init_ep_ret(cfg, mesh)

    def act_prep(sts):
        return [a.fold_actor(sts[i].actor) for i, a in enumerate(agents)]

    def act_fn(folded, ob, noise_std, k):
        acts = []
        for i, a in enumerate(agents):
            k, sub = jax.random.split(k)
            acts.append(a.choose_action_f(folded[i], ob[i], sub))
        return jnp.concatenate(acts, axis=-1)

    step = make_sharded_td3_superstep(
        cfg, agents, mesh, rollout_len=2, n_updates=1,
        train_fn=sac_lib.train_step, act_fn=act_fn, act_prep=act_prep)
    bstate, obs, rstate, states, ep_ret, metrics = step(
        bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(50), 0.1)
    assert np.isfinite(float(metrics["agent0/critic_loss"]))
    assert np.isfinite(float(metrics["agent0/alpha"]))
    w = jax.tree.leaves(states[0].actor)[0]
    assert w.sharding.is_fully_replicated
    _bit_identical_across_devices(w)


def test_sharded_matches_single_device_structure():
    """The sharded superstep produces the same pytree structure as the
    unsharded path, so checkpoints are interchangeable."""
    cfg = Config(framework="MONO", use_equiv=False, num_envs=8,
                 replay_buffer_size=256, batch_size=16, max_steps=32)
    mesh = mesh_lib.make_mesh(8)
    agents = [td3_lib.TD3Agent(cfg, 0, td3_models(cfg, 0))]
    states = [agents[0].init(jax.random.PRNGKey(0))]
    bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(1))
    ep_ret = init_ep_ret(cfg, mesh)
    step = make_sharded_td3_superstep(cfg, agents, mesh)
    b2, o2, r2, s2, ep2, m = step(bstate, obs, rstate, states, ep_ret,
                                  jax.random.PRNGKey(2), 0.2)
    assert jax.tree.structure(s2[0]) == jax.tree.structure(states[0])
    assert int(s2[0].total_it) == 1


def _collective_census(compiled_text):
    return {name: compiled_text.count(name) for name in
            ("all-gather", "all-to-all", "collective-permute",
             "reduce-scatter")}


def test_superstep_hlo_contains_only_allreduces():
    """Deterministic communication-minimality guard: the compiled sharded
    supersteps (TD3 off-policy and PPO on-policy) must contain all-reduces
    ONLY — the pmean'd gradients/metrics and psum'd episode stats.  Any
    all-gather / all-to-all / collective-permute / reduce-scatter means env
    state or parameters are being moved between devices behind our back
    (accidental resharding), which is exactly the failure mode that would
    sink BASELINE.md's near-linear multi-chip scaling."""
    cfg = Config(framework="MODUL", module_training="DTDE", use_equiv=False,
                 num_envs=16, replay_buffer_size=512, batch_size=32,
                 max_steps=64)
    mesh = mesh_lib.make_mesh(8)
    agents = [td3_lib.TD3Agent(cfg, i, td3_models(cfg, i)) for i in range(2)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
    bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(0))
    ep_ret = init_ep_ret(cfg, mesh)
    step = make_sharded_td3_superstep(cfg, agents, mesh, rollout_len=2,
                                      n_updates=1)
    out = step(bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(1),
               0.1)
    hlo = step.jitted[False].lower(
        bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(1),
        jnp.asarray(0.1, jnp.float32)).compile().as_text()
    assert hlo.count("all-reduce") > 0          # grads/stats ARE reduced
    assert _collective_census(hlo) == {
        "all-gather": 0, "all-to-all": 0, "collective-permute": 0,
        "reduce-scatter": 0}
    # and parameters remain fully replicated after execution
    w = jax.tree.leaves(out[3][0].actor)[0]
    assert w.sharding.is_fully_replicated

    pcfg = Config(framework="MODUL", module_training="DTDE", rl_algo="PPO",
                  use_equiv=False, num_envs=16, max_steps=64,
                  T_horizon=32, K_epochs=1, actor_batch_size=16,
                  critic_batch_size=16)
    pagents = [ppo_lib.PPOAgent(pcfg, i, ppo_models(pcfg, i))
               for i in range(2)]
    pstates = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(pagents)]
    pstates = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in pstates]
    pb, po, _ = sharded_init(pcfg, mesh, jax.random.PRNGKey(0),
                             with_replay=False)
    pep = init_ep_ret(pcfg, mesh)
    pstep = make_sharded_ppo_superstep(pcfg, pagents, mesh, rollout_len=2)
    pstep(pb, po, pstates, pep, jax.random.PRNGKey(3))
    phlo = pstep.jitted["fn"].lower(
        pb, po, pstates, pep, jax.random.PRNGKey(3)).compile().as_text()
    assert phlo.count("all-reduce") > 0
    assert _collective_census(phlo) == {
        "all-gather": 0, "all-to-all": 0, "collective-permute": 0,
        "reduce-scatter": 0}
