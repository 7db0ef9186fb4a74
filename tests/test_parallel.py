"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: DP-sharded rollout/learner steps testable without a cluster)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.models import td3_models
from gym_rotor_tpu.parallel import mesh as mesh_lib
from gym_rotor_tpu.parallel.train_step import (make_sharded_td3_superstep,
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
    assert bstate.env.x.sharding.spec == jax.sharding.PartitionSpec("env")

    step = make_sharded_td3_superstep(cfg, agents, mesh, rollout_len=4,
                                      n_updates=2)
    for it in range(3):
        bstate, obs, rstate, states, metrics = step(
            bstate, obs, rstate, states, jax.random.PRNGKey(10 + it), 0.1)
    assert np.isfinite(float(metrics["agent0/critic_loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))
    # replay advanced: 3 supersteps * 4 ticks * (16/8 envs per device)
    assert int(rstate.filled) == 3 * 4 * 2
    # params stayed replicated and finite
    w = jax.tree.leaves(states[0].actor)[0]
    assert np.isfinite(np.asarray(w)).all()


def test_sharded_matches_single_device_structure():
    """The sharded superstep produces the same pytree structure as the
    unsharded path, so checkpoints are interchangeable."""
    cfg = Config(framework="MONO", use_equiv=False, num_envs=8,
                 replay_buffer_size=256, batch_size=16, max_steps=32)
    mesh = mesh_lib.make_mesh(8)
    agents = [td3_lib.TD3Agent(cfg, 0, td3_models(cfg, 0))]
    states = [agents[0].init(jax.random.PRNGKey(0))]
    bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(1))
    step = make_sharded_td3_superstep(cfg, agents, mesh)
    b2, o2, r2, s2, m = step(bstate, obs, rstate, states,
                             jax.random.PRNGKey(2), 0.2)
    assert jax.tree.structure(s2[0]) == jax.tree.structure(states[0])
    assert int(s2[0].total_it) == 1
