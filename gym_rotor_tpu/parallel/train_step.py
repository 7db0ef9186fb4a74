"""Sharded actor-learner supersteps: rollout -> replay insert -> U learner
updates as ONE jitted shard_map program over the ``env`` mesh axis.

Layout (SURVEY.md §7.6):
* env state, trajectory state, observations, rollout transitions, and the
  replay ring all shard along the env/capacity axis — each device owns
  ``num_envs / n_devices`` environments and its slice of the replay buffer,
  and samples learner sub-batches from its *local* slice;
* agent parameters and optimizer states are replicated; per-device gradients
  are pmean-reduced over the mesh axis inside the update (XLA emits the
  all-reduce over ICI/DCN), so parameters stay bit-identical across devices;
* the whole superstep is one XLA program: no host round-trips between acting
  and learning, which is what makes 10M+ env-steps/s sustainable.

Two supersteps cover all three algorithm families:
* ``make_sharded_td3_superstep`` — off-policy (TD3/MATD3/SAC): rollout chunk
  -> sharded replay insert -> U pmean-reduced learner updates.  A ``warm``
  variant replaces the policy with uniform-random actions and skips the
  learner (the reference's start_timesteps warmup, main.py:154-155 + 184).
* ``make_sharded_ppo_superstep`` — on-policy (PPO): rollout exactly one
  T_horizon segment across the sharded envs, per-device GAE over the local
  (T, B_local) slice, K_epochs of minibatch updates with globally
  pmean-reduced gradients (reference ppo.py:104-216 semantics at scale).

Both also fold the reference's per-episode reward bookkeeping
(main.py:218-223) into the graph: episodic returns accumulate in a sharded
carry and finished-episode sums/counts come back psum-reduced, so the host
driver logs episode statistics without ever pulling rollouts off device.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..algos import ppo as ppo_lib
from ..algos import replay as replay_lib
from ..algos import td3 as td3_lib
from ..envs import batch as batch_lib
from ..utils.config import Config


def _episode_stats(axis, ep_ret, rewards, resets):
    """Accumulate per-env episodic returns across a rollout chunk and reduce
    finished-episode statistics over the mesh (reference main.py:218-223).

    rewards: (T, B, n_agents); resets: (T, B); ep_ret carry: (B, n_agents).
    Returns (ep_ret, fin_sum (n_agents,), fin_cnt ()) with fin_* psum-reduced.
    """
    def body(carry, xs):
        r, reset = xs
        carry = carry + r
        fin = jnp.sum(jnp.where(reset[:, None], carry, 0.0), axis=0)
        cnt = jnp.sum(reset.astype(jnp.float32))
        carry = jnp.where(reset[:, None], 0.0, carry)
        return carry, (fin, cnt)

    ep_ret, (fins, cnts) = jax.lax.scan(body, ep_ret, (rewards, resets))
    fin_sum = jax.lax.psum(fins.sum(0), axis)
    fin_cnt = jax.lax.psum(cnts.sum(), axis)
    return ep_ret, fin_sum, fin_cnt


def make_sharded_td3_superstep(cfg: Config, agents: Sequence, mesh: Mesh,
                               rollout_len: int = 1, n_updates: int = 1,
                               train_fn=None, act_fn=None, act_prep=None):
    """Build the jitted sharded off-policy superstep.

    Returns ``step(bstate, obs, replay, states, ep_ret, key, noise_std,
    warm=False)`` -> ``(bstate, obs, replay, states, ep_ret, metrics)`` where
    bstate/obs/replay/ep_ret are env-axis sharded and states are replicated.
    ``warm=True`` compiles a second variant with uniform-random actions and
    no learner updates (reference start_timesteps warmup, main.py:154-155);
    its metrics carry only the episode statistics.

    ``act_fn(act_state, obs_tuple, noise_std, key) -> joint action`` overrides
    the default TD3 noisy-deterministic policy (e.g. SAC sampling), where
    ``act_state = act_prep(states)`` (default: the states list) is computed
    ONCE per rollout chunk outside the tick scan — the hook where
    cfg.equiv_fold folds the actors' equivariant projection per chunk.
    """
    axis = cfg.mesh_axis
    train_fn = train_fn or td3_lib.train_step
    n_dev = mesh.devices.size
    local_batch = max(cfg.batch_size // n_dev, 1)
    act_total = sum(cfg.action_dim_n)

    env_spec = P(axis)
    rep_spec = P()

    replay_specs = replay_lib.ReplayState(
        data=env_spec, ptr=rep_spec, filled=rep_spec,
        dims=(tuple(cfg.obs_dim_n), tuple(cfg.action_dim_n)),
    )

    def body(bstate, obs, rstate, states, ep_ret, key, noise_std, *,
             warm: bool):
        # Per-device key stream
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_roll, k_upd = jax.random.split(key)

        # Fold the actors' equivariant projection ONCE per rollout chunk,
        # outside the tick scan (identity when cfg.equiv_fold is off) —
        # guarantees the projection is loop-invariant instead of relying on
        # XLA to hoist it out of the scan body.
        if warm:
            act_state = None
        elif act_fn is not None:
            act_state = act_prep(states) if act_prep is not None else states
        else:
            act_state = [a.fold_actor(states[i].actor)
                         for i, a in enumerate(agents)]

        def policy(ps, ob, k):
            if warm:
                return jax.random.uniform(
                    k, (ob[0].shape[0], act_total), jnp.float32, -1.0, 1.0)
            if act_fn is not None:
                return act_fn(ps, ob, noise_std, k)
            acts = []
            for i, agent in enumerate(agents):
                k, sub = jax.random.split(k)
                acts.append(agent.choose_action_f(ps[i], ob[i],
                                                  noise_std, sub))
            return jnp.concatenate(acts, axis=-1)

        # Fused rollout -> ring insert -> episode stats: each tick
        # scatter-writes its B rows straight into the replay ring inside
        # the scan (bitwise the same ring as stacking + insert_rollout,
        # tests/test_algos.py) AND accumulates the episodic-return
        # bookkeeping (reference main.py:218-223) in the carry, so the scan
        # stacks NOTHING — the staged design paid write-stack + read-stack
        # + scatter per transition element plus a second scan over stacked
        # (T, B) rewards for the stats (measured ~28% of the warm rollout).
        fin0 = (jnp.zeros((cfg.n_agents,), jnp.float32), jnp.zeros(()),
                jnp.zeros(()))

        def roll_body(carry, _):
            bs, ob, rs, k, ep, (fin, cnt, rsum) = carry
            k, sub = jax.random.split(k)
            actions = policy(act_state, ob, sub)
            bs, out = batch_lib.batched_step(cfg, bs, actions)
            rs = replay_lib.insert_tick(rs, ob, actions, out.reward,
                                        out.info["terminal_obs"], out.done)
            reset = out.reset_happened
            ep = ep + out.reward
            fin = fin + jnp.sum(jnp.where(reset[:, None], ep, 0.0), axis=0)
            cnt = cnt + jnp.sum(reset.astype(jnp.float32))
            rsum = rsum + out.reward.sum()
            ep = jnp.where(reset[:, None], 0.0, ep)
            return (bs, out.obs, rs, k, ep, (fin, cnt, rsum)), None

        (bstate, obs, rstate, _, ep_ret, (fin, cnt, rsum)), _ = jax.lax.scan(
            roll_body, (bstate, obs, rstate, k_roll, ep_ret, fin0), None,
            length=rollout_len)

        n_rewards = rollout_len * obs[0].shape[0] * cfg.n_agents
        metrics = {
            "mean_reward": jax.lax.pmean(rsum / n_rewards, axis),
            "fin_sum": jax.lax.psum(fin, axis),
            "fin_cnt": jax.lax.psum(cnt, axis),
        }

        if not warm:
            def upd(carry, k):
                states = carry
                ks, ku = jax.random.split(k)
                b = replay_lib.sample(rstate, ks, local_batch)
                states, m = train_fn(cfg, agents, states, b, ku,
                                     axis_name=axis)
                return states, m

            keys = jax.random.split(k_upd, n_updates)
            states, m = jax.lax.scan(upd, states, keys)
            # losses are computed on each device's local sub-batch: reduce so
            # the reported metrics are the global means (and truly
            # replicated, matching the P() out_spec)
            metrics.update(jax.tree.map(
                lambda x: jax.lax.pmean(x[-1], axis), m))
        return bstate, obs, rstate, states, ep_ret, metrics

    def build(bstate, obs, states, warm):
        in_specs = (
            jax.tree.map(lambda _: env_spec, bstate),
            jax.tree.map(lambda _: env_spec, obs),
            replay_specs,
            jax.tree.map(lambda _: rep_spec, states),
            env_spec, rep_spec, rep_spec,
        )
        out_specs = (
            jax.tree.map(lambda _: env_spec, bstate),
            jax.tree.map(lambda _: env_spec, obs),
            replay_specs,
            jax.tree.map(lambda _: rep_spec, states),
            env_spec, rep_spec,
        )
        # Donate the replay ring: without input-output aliasing XLA must
        # COPY the whole ring once per superstep before the first in-scan
        # scatter (the input buffer stays live from the caller's view).
        # Measured: warm superstep wall time scaled with ring capacity
        # (15.5 ms at 1e4 rows -> 54.7 ms at 1e6 rows, fixed work) before
        # donation; capacity-independent after.  Callers already reassign
        # the returned ReplayState (train.py, bench_train.py).
        return jax.jit(shard_map(
            partial(body, warm=warm), mesh=mesh, in_specs=in_specs,
            out_specs=out_specs, check_vma=False,
        ), donate_argnums=(2,))

    compiled = {}

    def step(bstate, obs, rstate, states, ep_ret, key, noise_std,
             warm: bool = False):
        if warm not in compiled:
            compiled[warm] = build(bstate, obs, states, warm)
        return compiled[warm](bstate, obs, rstate, states, ep_ret, key,
                              jnp.asarray(noise_std, jnp.float32))

    # Introspection hook: step.jitted[warm] is the underlying jit-wrapped
    # shard_map program once that variant has run (bench_scale.py lowers it
    # to compiled HLO and censuses the collectives it contains).
    step.jitted = compiled
    return step


def make_sharded_ppo_superstep(cfg: Config, agents: Sequence, mesh: Mesh,
                               rollout_len: int):
    """On-policy sharded superstep: collect one T_horizon segment over the
    env-sharded batch, then run the full PPO update (GAE + K_epochs of
    minibatches, reference ppo.py:104-216) with gradients pmean-reduced over
    the mesh so parameters stay replicated.

    Returns ``step(bstate, obs, states, ep_ret, key)`` ->
    ``(bstate, obs, states, ep_ret, metrics)``.
    """
    axis = cfg.mesh_axis
    n = cfg.n_agents
    env_spec = P(axis)
    rep_spec = P()

    def body(bstate, obs, states, ep_ret, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_roll, k_upd = jax.random.split(key)

        # fold the actors once per horizon segment, outside the tick scan
        folded_actors = [a.fold_actor(states[i].actor)
                         for i, a in enumerate(agents)]

        def scan_body(carry, k):
            bs, ob = carry
            acts, logps = [], []
            for i, agent in enumerate(agents):
                k, sub = jax.random.split(k)
                a, lp = agent.choose_action_f(folded_actors[i], ob[i], sub)
                acts.append(a)
                logps.append(lp)
            bs, out = batch_lib.batched_step(
                cfg, bs, jnp.concatenate(acts, axis=-1))
            row = (ob, tuple(acts), out.reward, out.info["terminal_obs"],
                   out.done, tuple(logps), out.reset_happened)
            return (bs, out.obs), row

        keys = jax.random.split(k_roll, rollout_len)
        (bstate, obs), rows = jax.lax.scan(scan_body, (bstate, obs), keys)
        obs_t, act_t, rwd, next_obs_t, done, logp_t, resets = rows

        data = ppo_lib.Horizon(
            obs=obs_t, act=act_t,
            rwd=tuple(rwd[..., i][..., None] for i in range(n)),
            next_obs=next_obs_t,
            done=tuple(done[..., i][..., None].astype(jnp.float32)
                       for i in range(n)),
            logprob=logp_t,
        )
        states, metrics = ppo_lib.train_step(cfg, agents, states, data,
                                             k_upd, axis_name=axis)
        metrics = jax.tree.map(lambda x: jax.lax.pmean(x, axis), metrics)

        ep_ret, fin_sum, fin_cnt = _episode_stats(axis, ep_ret, rwd, resets)
        metrics["mean_reward"] = jax.lax.pmean(rwd.mean(), axis)
        metrics["fin_sum"] = fin_sum
        metrics["fin_cnt"] = fin_cnt
        return bstate, obs, states, ep_ret, metrics

    def build(bstate, obs, states):
        in_specs = (
            jax.tree.map(lambda _: env_spec, bstate),
            jax.tree.map(lambda _: env_spec, obs),
            jax.tree.map(lambda _: rep_spec, states),
            env_spec, rep_spec,
        )
        out_specs = (
            jax.tree.map(lambda _: env_spec, bstate),
            jax.tree.map(lambda _: env_spec, obs),
            jax.tree.map(lambda _: rep_spec, states),
            env_spec, rep_spec,
        )
        return jax.jit(shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ))

    compiled = {}

    def step(bstate, obs, states, ep_ret, key):
        if "fn" not in compiled:
            compiled["fn"] = build(bstate, obs, states)
        return compiled["fn"](bstate, obs, states, ep_ret, key)

    step.jitted = compiled
    return step


def sharded_init(cfg: Config, mesh: Mesh, key, env_type="train",
                 with_replay=True):
    """Reset batched envs (+ replay for off-policy) with env-axis shardings
    applied."""
    axis = cfg.mesh_axis
    env_sh = NamedSharding(mesh, P(axis))
    bstate, obs = batch_lib.batched_reset(cfg, key, env_type)
    bstate = jax.device_put(bstate, env_sh)
    obs = jax.device_put(obs, env_sh)
    if not with_replay:
        return bstate, obs, None
    rstate = replay_lib.create(cfg.replay_buffer_size, cfg.obs_dim_n,
                               cfg.action_dim_n)
    rstate = shard_replay(mesh, rstate, axis)
    return bstate, obs, rstate


def init_ep_ret(cfg: Config, mesh: Mesh):
    """Env-sharded episodic-return accumulator carried across supersteps."""
    return jax.device_put(
        jnp.zeros((cfg.num_envs, cfg.n_agents), jnp.float32),
        NamedSharding(mesh, P(cfg.mesh_axis)))


def shard_replay(mesh: Mesh, rstate, axis="env"):
    """Apply env/capacity-axis shardings to a ReplayState (fresh or loaded
    from a checkpoint)."""
    env_sh = NamedSharding(mesh, P(axis))
    rep_sh = NamedSharding(mesh, P())
    return replay_lib.ReplayState(
        data=jax.device_put(rstate.data, env_sh),
        ptr=jax.device_put(rstate.ptr, rep_sh),
        filled=jax.device_put(rstate.filled, rep_sh),
        dims=rstate.dims,
    )
