"""Decompose the env engine's per-tick cost (VERDICT r3 #6).

Times rollout variants at several batch sizes with the slope method:

  full          — envs.batch.batched_step exactly as the benchmark runs it
                  (dense compute-all-then-select auto-reset)
  no_reset      — same tick minus the auto-reset branch; upper bound on
                  what a cheaper reset formulation could reclaim
  dyn_only      — trajectory goal + quad.step only (no reset, no
                  episode-cap bookkeeping): the irreducible physics+obs cost
  sparse        — the REJECTED round-5 sparse auto-reset (gather finished
                  envs into S lanes + overflow lax.cond); measurement-only
  sparse_nocond — same without the cond (semantics-breaking; isolates the
                  cond's cost from the gather/scatter's)

Prints one JSON line per (variant, num_envs).
Usage: python scripts/env_ceiling_probe.py [--envs 4096,65536] [--steps 1000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_rotor_tpu.utils.jax_cache import enable_compile_cache

enable_compile_cache()

from gym_rotor_tpu.envs import batch as batch_lib
from gym_rotor_tpu.envs import quad
from gym_rotor_tpu.envs.trajectory import get_desired
from gym_rotor_tpu.utils.config import Config


def make_step(cfg, variant):
    if variant == "full":
        def step(bs, actions):
            return batch_lib.batched_step(cfg, bs, actions)
        return step

    if variant in ("sparse", "sparse_nocond"):
        # The rejected round-5 "sparse auto-reset": compact the finished
        # envs' indices into S = B/16 lanes, compute fresh states only
        # there, scatter back.  Kept here MEASUREMENT-ONLY as the negative
        # result's reproduction: the dynamic-index gather/scatter over the
        # state pytree breaks whole-step fusion and loses 6-10x to the
        # dense compute-all-then-select formulation that ships
        # (docs/DESIGN.md §1.4).  "sparse" includes the overflow lax.cond
        # falling back to dense (the semantics-complete form);
        # "sparse_nocond" drops the cond (envs beyond S in one tick would
        # linger unreset — semantics-breaking, isolates the cond's
        # fusion-boundary cost from the gather/compute/scatter cost).
        def step(bs, actions):
            from gym_rotor_tpu.envs.batch import BatchedEnvState
            from gym_rotor_tpu.envs.trajectory import (TrajState,
                                                       mark_traj_start)

            def desired(ts, s):
                return get_desired(ts, s.x, s.v, s.R, s.W,
                                   cfg.train_traj_mode)
            traj, goal = jax.vmap(desired)(bs.traj, bs.env)
            env = bs.env.replace(goal=goal)
            env2, out = jax.vmap(lambda s, a: quad.step(cfg, s, a))(env,
                                                                    actions)
            at_cap = env2.t >= cfg.max_steps
            episode_over = jnp.any(out.done, axis=-1) | at_cap
            B = episode_over.shape[0]
            S = max(B // 16, 1)

            def fresh(s):
                k1, k2 = jax.random.split(s.key)
                ns = quad.reset_state(cfg, k1, "train", s.x.dtype)
                ts = TrajState.create(k2, s.x.dtype)
                ts = mark_traj_start(ts, ns.x, ns.R)
                ts, goal = get_desired(ts, ns.x, ns.v, ns.R, ns.W,
                                       cfg.train_traj_mode)
                ns = ns.replace(goal=goal)
                ns, obs = quad.initial_obs(cfg, ns)
                return ns, ts, obs

            def sparse_reset(_):
                idx = jnp.nonzero(episode_over, size=S, fill_value=B)[0]
                sub = jax.tree.map(lambda a: a[jnp.minimum(idx, B - 1)],
                                   env2)
                f_env, f_traj, _ = jax.vmap(fresh)(sub)
                scat = lambda full, s: full.at[idx].set(s, mode="drop")
                env_next = jax.tree.map(scat, env2, f_env)
                traj_next = jax.tree.map(scat, traj, f_traj)
                return env_next, traj_next

            def dense_reset(_):
                f_env, f_traj, _ = jax.vmap(fresh)(env2)
                sel = lambda a, b: jnp.where(
                    episode_over.reshape(
                        episode_over.shape + (1,) * (a.ndim - 1)), a, b)
                return (jax.tree.map(sel, f_env, env2),
                        jax.tree.map(sel, f_traj, traj))

            if variant == "sparse_nocond":
                env_next, traj_next = sparse_reset(None)
            else:
                env_next, traj_next = jax.lax.cond(
                    jnp.sum(episode_over) <= S, sparse_reset, dense_reset,
                    None)
            return BatchedEnvState(env=env_next, traj=traj_next), out
        return step

    def step(bs, actions):
        def desired(ts, s):
            return get_desired(ts, s.x, s.v, s.R, s.W, cfg.train_traj_mode)
        traj, goal = jax.vmap(desired)(bs.traj, bs.env)
        env = bs.env.replace(goal=goal)
        env2, out = jax.vmap(lambda s, a: quad.step(cfg, s, a))(env, actions)
        if variant == "no_reset":
            at_cap = env2.t >= cfg.max_steps
            episode_over = jnp.any(out.done, axis=-1) | at_cap
            # keep stepping the same episode regardless (state reuse) but
            # keep the done bookkeeping so outputs match shape/semantics
            _ = episode_over
        return batch_lib.BatchedEnvState(env=env2, traj=traj), out

    return step


def fence(x):
    return float(jnp.sum(x))


def run(cfg, variant, steps, iters_b=6):
    step = make_step(cfg, variant)

    @jax.jit
    def roll(bs, key):
        def body(carry, _):
            bs, k = carry
            k, sub = jax.random.split(k)
            a = jax.random.uniform(sub, (cfg.num_envs, 4), jnp.float32,
                                   -0.1, 0.1)
            bs, out = step(bs, a)
            return (bs, k), None
        (bs, _), _ = jax.lax.scan(body, (bs, key), None, length=steps)
        return bs

    bs0, _ = jax.jit(lambda k: batch_lib.batched_reset(cfg, k))(
        jax.random.PRNGKey(0))
    bs = roll(bs0, jax.random.PRNGKey(1))
    fence(bs.env.x)
    best = 0.0
    for rep in range(2):
        t0 = time.perf_counter()
        bs1 = roll(bs, jax.random.PRNGKey(2))
        fence(bs1.env.x)
        t1 = time.perf_counter()
        b = bs1
        for i in range(iters_b):
            b = roll(b, jax.random.PRNGKey(3 + i))
        fence(b.env.x)
        t2 = time.perf_counter()
        rate = (iters_b - 1) * steps * cfg.num_envs / ((t2 - t1) - (t1 - t0))
        best = max(best, rate)
    print(json.dumps({"probe": "env_ceiling", "variant": variant,
                      "num_envs": cfg.num_envs,
                      "env_steps_per_sec": best,
                      "us_per_tick": 1e6 * cfg.num_envs / best}))
    sys.stdout.flush()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", default="4096,65536")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--variants", default="full,no_reset,dyn_only")
    args = p.parse_args()
    for n in [int(x) for x in args.envs.split(",")]:
        for v in args.variants.split(","):
            cfg = Config(framework="MONO", integrator="rk4", num_envs=n,
                         max_steps=4000)
            run(cfg, v, args.steps)


if __name__ == "__main__":
    main()
