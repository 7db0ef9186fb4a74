"""Chip breakdown of the warm rollout path: the bare MODUL env scan, plus
stacked reward/reset outputs ("stats"), plus the fused ring insert
("full"), at 4096 envs x 200 ticks.  2026-08-18 measurement: bare
2.83us/tick, stats 3.92, full 3.74 — the in-scan ring scatter is free and
the stacked outputs for the (since removed) second episode-stats scan cost
~1us/tick, which motivated accumulating episode stats in the scan carry
(parallel/train_step.py roll_body).  Run from the repo root."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_rotor_tpu.algos import replay as replay_lib
from gym_rotor_tpu.envs import batch as batch_lib
from gym_rotor_tpu.utils.config import Config

cfg = Config(framework="MODUL", module_training="DTDE", use_equiv=False,
             num_envs=4096, replay_buffer_size=1_000_000, max_steps=4000)
T = 200
B = cfg.num_envs
act_total = sum(cfg.action_dim_n)
key = jax.random.PRNGKey(0)
bstate, obs = jax.jit(lambda k: batch_lib.batched_reset(cfg, k))(key)
rstate = replay_lib.create(cfg.replay_buffer_size, cfg.obs_dim_n,
                           cfg.action_dim_n)


def policy(ob, k):
    return jax.random.uniform(k, (B, act_total), jnp.float32, -1.0, 1.0)


def make(variant):
    def body(carry, _):
        bs, ob, rs, k = carry
        k, sub = jax.random.split(k)
        a = policy(ob, sub)
        bs, out = batch_lib.batched_step(cfg, bs, a)
        if variant == "full":
            rs = replay_lib.insert_tick(rs, ob, a, out.reward,
                                        out.info["terminal_obs"], out.done)
        if variant == "bare":
            return (bs, out.obs, rs, k), None
        return (bs, out.obs, rs, k), (out.reward, out.reset_happened)

    @jax.jit
    def run(bs, ob, rs, k):
        (bs, ob, rs, _), ys = jax.lax.scan(body, (bs, ob, rs, k), None,
                                           length=T)
        if variant == "bare":
            return bs, ob, rs, jnp.zeros(())
        rews, resets = ys
        return bs, ob, rs, rews.sum() + resets.sum()

    return run


for variant in ("bare", "stats", "full"):
    run = make(variant)
    bs, ob, rs = bstate, obs, rstate
    bs, ob, rs, s = run(bs, ob, rs, jax.random.PRNGKey(1))
    float(jnp.sum(bs.env.x))  # transfer barrier — block_until_ready is a
    # no-op through the axon tunnel (scripts/block_semantics_probe.py)
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(5):
            bs, ob, rs, s = run(bs, ob, rs, jax.random.PRNGKey(2 + i))
        float(jnp.sum(bs.env.x)) + float(jnp.sum(rs.obs[0]))
        best = min(best, (time.perf_counter() - t0) / 5)
    print(json.dumps({"variant": variant, "s_per_superstep": best,
                      "steps_per_sec": B * T / best,
                      "us_per_tick": best / T * 1e6}))
