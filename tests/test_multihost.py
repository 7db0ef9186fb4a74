"""Multi-HOST training validation without a cluster (SURVEY.md §4):
two separate processes bring up jax.distributed over localhost, form a
global 2-device mesh, and run the full sharded TD3 superstep — the same
code path a TPU pod slice uses (ICI/DCN collectives via XLA)."""
import os
import subprocess
import sys

import pytest

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import multihost_utils

from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.models import td3_models
from gym_rotor_tpu.parallel import mesh as mesh_lib
from gym_rotor_tpu.parallel.train_step import (init_ep_ret,
                                               make_sharded_td3_superstep,
                                               sharded_init)
from gym_rotor_tpu.utils.config import Config

devs = jax.devices()
assert len(devs) == 2, f"want 2 global devices, got {devs}"
mesh = Mesh(np.asarray(devs), ("env",))

cfg = Config(framework="MONO", use_equiv=False, num_envs=4,
             replay_buffer_size=128, batch_size=8, max_steps=16)
agents = [td3_lib.TD3Agent(cfg, 0, td3_models(cfg, 0))]
states = [agents[0].init(jax.random.PRNGKey(0))]
states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(1))
ep_ret = init_ep_ret(cfg, mesh)
step = make_sharded_td3_superstep(cfg, agents, mesh, rollout_len=3,
                                  n_updates=1)
for it in range(2):
    bstate, obs, rstate, states, ep_ret, metrics = step(
        bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(2 + it), 0.1)
loss = float(metrics["agent0/critic_loss"])
rew = float(metrics["mean_reward"])
assert np.isfinite(loss) and np.isfinite(rew)
# parameters stay replicated: each process reads its local copy of the
# global array; the digest must match across processes (checked by the
# parent test)
w = np.asarray(jax.device_get(jax.tree.leaves(states[0].actor)[0]))
digest = float(np.abs(w).sum())
print(f"MH_OK proc={pid} loss={loss:.6f} reward={rew:.6f} "
      f"digest={digest:.9f}", flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="linux only")
def test_two_process_distributed_superstep(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    port = "9917"
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), port],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    digests = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "MH_OK" in out
        digests.append(out.split("digest=")[1].split()[0])
    assert digests[0] == digests[1], f"params diverged: {digests}"
