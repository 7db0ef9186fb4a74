"""Honest chip throughput via the two-point slope method.

Through the axon tunnel, jax.block_until_ready is a no-op
(block_semantics_probe.py), so the only correct fence is a host TRANSFER of
a most-downstream output — but one transfer costs a full tunnel round trip
(~0.3 s), which dominates any measurement whose device work is not >> RTT.

The slope method cancels that constant: time the SAME compiled call chained
iters_a times and iters_b times, each fenced by one transfer; the rate is
  (work_b - work_a) / (dt_b - dt_a)
— the RTT and any other per-measurement constant drop out.  Per-call host
dispatch does NOT drop out, but it pipelines under device execution, so it
only shows when dispatch/call > device/call; calls here are sized so device
time per call is >> dispatch (~1-3 ms through the tunnel).

Prints one JSON line per config.  Run on the real chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_rotor_tpu.utils.jax_cache import enable_compile_cache

enable_compile_cache()


def fence(x):
    return float(jnp.sum(x))


def rtt_probe(reps=5):
    one = jnp.ones(())
    fence(one)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(one)
        ts.append(time.perf_counter() - t0)
    return ts


def slope(run_once, fence_of, iters_a, iters_b, work_per_iter, reps=2):
    """rate = extra work / extra time between a short and a long chain."""
    out = []
    for rep in range(reps):
        dts = []
        for iters in (iters_a, iters_b):
            t0 = time.perf_counter()
            carry = None
            for i in range(iters):
                carry = run_once(carry, 1000 * rep + i)
            fence(fence_of(carry))
            dts.append(time.perf_counter() - t0)
        rate = (iters_b - iters_a) * work_per_iter / (dts[1] - dts[0])
        out.append({"dt_a": dts[0], "dt_b": dts[1], "rate": rate})
    return out


def env_probe(num_envs, steps_per_call, iters_a, iters_b):
    from gym_rotor_tpu.envs import batch
    from gym_rotor_tpu.utils.config import Config

    cfg = Config(framework="MONO", integrator="rk4", num_envs=num_envs,
                 max_steps=4000)
    bs0, obs0 = jax.jit(lambda k: batch.batched_reset(cfg, k))(
        jax.random.PRNGKey(0))

    def policy(_, ob, k):
        return jax.random.uniform(k, (num_envs, 4), jnp.float32, -0.1, 0.1)

    @jax.jit
    def run(b, o, k):
        b, o, trs, outs = batch.rollout(cfg, b, o, k, policy, None,
                                        steps_per_call)
        return b, o, outs.reward.sum()

    bs, obs, _ = run(bs0, obs0, jax.random.PRNGKey(1))
    fence(bs.env.x)
    state = {"b": bs, "o": obs}

    def run_once(carry, i):
        c = carry or state
        b, o, s = run(c["b"], c["o"], jax.random.PRNGKey(2 + i))
        return {"b": b, "o": o}

    res = slope(run_once, lambda c: c["b"].env.x, iters_a, iters_b,
                num_envs * steps_per_call)
    print(json.dumps({"probe": "env", "num_envs": num_envs,
                      "steps_per_call": steps_per_call, "points": res}))
    sys.stdout.flush()


def train_probe(mlp, fold, rollout_len, iters_a, iters_b):
    from gym_rotor_tpu.algos import td3 as td3_lib
    from gym_rotor_tpu.models import td3_models
    from gym_rotor_tpu.parallel import mesh as mesh_lib
    from gym_rotor_tpu.parallel.train_step import (init_ep_ret,
                                                   make_sharded_td3_superstep,
                                                   sharded_init)
    from gym_rotor_tpu.utils.config import Config

    num_envs = 4096
    kw = dict(rl_algo="TD3", num_envs=num_envs, batch_size=num_envs,
              replay_buffer_size=1_000_000, max_steps=4000)
    if mlp:
        cfg = Config(framework="MONO", use_equiv=False, **kw)
    else:
        cfg = Config(framework="MODUL", module_training="DTDE",
                     use_equiv=True, equiv_fold=fold, **kw)
    mesh = mesh_lib.make_mesh()
    agents = [td3_lib.TD3Agent(cfg, i, td3_models(cfg, i))
              for i in range(cfg.n_agents)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    states = [jax.device_put(s, mesh_lib.replicated(mesh)) for s in states]
    bstate, obs, rstate = sharded_init(cfg, mesh, jax.random.PRNGKey(0))
    ep_ret = init_ep_ret(cfg, mesh)
    step = make_sharded_td3_superstep(cfg, agents, mesh,
                                      rollout_len=rollout_len,
                                      n_updates=rollout_len)
    c0 = step(bstate, obs, rstate, states, ep_ret, jax.random.PRNGKey(1), 0.1)
    fence(jax.tree.leaves(c0[3][0].actor)[0])

    # The superstep DONATES the replay ring (train_step.py donate_argnums),
    # so a chain must never restart from a carry whose ring was already fed
    # through step() — thread the latest carry across chains/reps instead of
    # resetting to c0.
    last = {"c": c0}

    def run_once(carry, i):
        c = carry or last["c"]
        out = step(c[0], c[1], c[2], c[3], c[4],
                   jax.random.PRNGKey(2 + i), 0.1)
        last["c"] = out
        return out

    res = slope(run_once, lambda c: jax.tree.leaves(c[3][0].actor)[0],
                iters_a, iters_b, num_envs * rollout_len)
    print(json.dumps({"probe": "train",
                      "model": "MONO-MLP" if mlp else
                      ("MODUL-EMLP-fold" if fold else "MODUL-EMLP"),
                      "rollout_len": rollout_len, "points": res}))
    sys.stdout.flush()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(json.dumps({"probe": "rtt", "fence_s": rtt_probe()}))
    sys.stdout.flush()
    if which in ("all", "env"):
        env_probe(4096, 5000, 2, 12)
        env_probe(65536, 1000, 1, 6)
    if which in ("all", "train"):
        train_probe(mlp=False, fold=True, rollout_len=200, iters_a=1,
                    iters_b=26)
        train_probe(mlp=True, fold=False, rollout_len=200, iters_a=1,
                    iters_b=26)
