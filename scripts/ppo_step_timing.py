"""Synchronous timing of ONE sharded PPO superstep + verification that the
minibatch updates actually run (params must change between supersteps)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from gym_rotor_tpu.algos import ppo as ppo_lib
from gym_rotor_tpu.models import ppo_models
from gym_rotor_tpu.parallel import mesh as mesh_lib
from gym_rotor_tpu.parallel.train_step import (init_ep_ret,
                                               make_sharded_ppo_superstep,
                                               sharded_init)
from gym_rotor_tpu.utils.config import Config

B, T = (int(x) for x in sys.argv[1:3]) if len(sys.argv) > 2 else (2048, 10)
cfg = Config(framework="MODUL", module_training="DTDE", rl_algo="PPO",
             use_equiv=True, num_envs=B, max_steps=4000, T_horizon=B * T,
             K_epochs=20)
mesh = mesh_lib.make_mesh()
agents = [ppo_lib.PPOAgent(cfg, i, ppo_models(cfg, i)) for i in range(2)]
states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
bstate, obs, _ = sharded_init(cfg, mesh, jax.random.PRNGKey(0),
                              with_replay=False)
ep_ret = init_ep_ret(cfg, mesh)
step = make_sharded_ppo_superstep(cfg, agents, mesh, rollout_len=T)

w0 = np.asarray(jax.tree.leaves(states[0].actor)[0]).copy()
out = step(bstate, obs, states, ep_ret, jax.random.PRNGKey(1))
jax.block_until_ready(out)
bstate, obs, states, ep_ret, metrics = out
w1 = np.asarray(jax.tree.leaves(states[0].actor)[0])
print("params changed after superstep:", bool((w0 != w1).any()))
print("total_it:", int(states[0].total_it),
      "actor_loss:", float(metrics["agent0/actor_loss"]))

for rep in range(3):
    t0 = time.perf_counter()
    out = step(bstate, obs, states, ep_ret, jax.random.PRNGKey(2 + rep))
    bstate, obs, states, ep_ret, metrics = out
    # transfer barrier (block_until_ready is a no-op via the axon tunnel)
    float(jax.numpy.sum(jax.tree.leaves(states[0].actor)[0]))
    dt = time.perf_counter() - t0
    n_mb = (B * T // cfg.actor_batch_size + B * T // cfg.critic_batch_size)
    print(f"superstep {dt*1e3:.2f} ms = {B*T/dt/1e6:.1f}M steps/s; "
          f"{cfg.K_epochs} epochs x {n_mb} minibatches x 2 agents")
