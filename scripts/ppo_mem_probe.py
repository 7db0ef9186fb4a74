"""Bisect the PPO superstep's HBM blowup: compile (AOT, no execute) the
sharded PPO superstep at growing (B, T) / K_epochs / minibatch settings and
report peak-memory estimates or OOM. Run from the repo root on the chip."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_rotor_tpu.algos import ppo as ppo_lib
from gym_rotor_tpu.models import ppo_models
from gym_rotor_tpu.parallel import mesh as mesh_lib
from gym_rotor_tpu.parallel.train_step import (init_ep_ret,
                                               make_sharded_ppo_superstep,
                                               sharded_init)
from gym_rotor_tpu.utils.config import Config

B, T, K, mb = (int(x) for x in sys.argv[1:5])
cfg = Config(framework="MODUL", module_training="DTDE", rl_algo="PPO",
             use_equiv=True, num_envs=B, max_steps=4000,
             T_horizon=B * T, K_epochs=K,
             actor_batch_size=mb, critic_batch_size=mb)
mesh = mesh_lib.make_mesh()
agents = [ppo_lib.PPOAgent(cfg, i, ppo_models(cfg, i)) for i in range(2)]
states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
bstate, obs, _ = sharded_init(cfg, mesh, jax.random.PRNGKey(0),
                              with_replay=False)
ep_ret = init_ep_ret(cfg, mesh)
step = make_sharded_ppo_superstep(cfg, agents, mesh, rollout_len=T)
try:
    out = step(bstate, obs, states, ep_ret, jax.random.PRNGKey(1))
    jax.block_until_ready(out[-1]["mean_reward"])
    print(f"OK B={B} T={T} K={K} mb={mb}")
except Exception as e:
    msg = str(e)
    cut = msg.find("Used ")
    print(f"FAIL B={B} T={T} K={K} mb={mb}: "
          f"{msg[cut:cut + 80] if cut >= 0 else msg[:200]}")
    with open("/tmp/ppo_oom_full.txt", "w") as f:
        f.write(msg)
