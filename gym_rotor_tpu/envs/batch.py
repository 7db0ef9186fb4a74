"""Batched lockstep environments with in-graph auto-reset.

This is the framework's core new component relative to the reference
(SURVEY.md §2 row 30): the reference steps exactly one env per Python-loop
iteration (main.py:140-164); here thousands of envs step as one fused XLA
program — ``vmap`` over the pure step, trajectory generation compiled in,
episode termination handled by in-graph re-initialization (fresh PRNG keys,
re-randomized UDM params per episode, exactly like the reference's
between-episode reset at main.py:226-229 + quad.py:179).

The driver-level episode-cap/"solved" override (main.py:169-173) is folded in:
at ``cfg.max_steps`` the episode ends, and the done flag recorded for
training is the solved-criterion value rather than a crash.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.config import Config
from . import quad
from .quad import X_LIM
from .state import EnvState
from .trajectory import TrajState, get_desired, mark_traj_start


@struct.dataclass
class BatchedEnvState:
    env: EnvState          # batched over leading dim
    traj: TrajState        # batched over leading dim


class BatchedStepOut(NamedTuple):
    obs: tuple             # per-agent (B, obs_dim) arrays (MONO: 1-tuple)
    reward: jnp.ndarray    # (B, n_agents)
    done: jnp.ndarray      # (B, n_agents) done recorded for training
    reset_happened: jnp.ndarray  # (B,) episode boundary flag
    info: dict


def _obs_tuple(cfg: Config, obs):
    return obs if cfg.framework == "MODUL" else (obs,)


def batched_reset(cfg: Config, key: jax.Array, env_type: str = "train",
                  dtype=jnp.float32) -> Tuple[BatchedEnvState, tuple]:
    """Reset ``cfg.num_envs`` envs + trajectory machines; returns first obs
    (with the driver's initial get_desired/set_goal applied,
    main.py:126-129)."""
    n = cfg.num_envs
    env_keys, traj_keys = jax.random.split(key)
    env_keys = jax.random.split(env_keys, n)
    traj_keys = jax.random.split(traj_keys, n)

    def one(ek, tk):
        state = quad.reset_state(cfg, ek, env_type, dtype)
        ts = TrajState.create(tk, dtype)
        ts = mark_traj_start(ts, state.x, state.R)
        ts, goal = get_desired(
            ts, state.x, state.v, state.R, state.W, cfg.train_traj_mode
        )
        state = state.replace(goal=goal)
        # exactly one first-obs integral update, after goal assignment
        # (driver order main.py:126-129)
        state, obs = quad.initial_obs(cfg, state)
        return BatchedEnvState(env=state, traj=ts), obs

    bstate, obs = jax.vmap(one)(env_keys, traj_keys)
    return bstate, _obs_tuple(cfg, obs)


def batched_step(cfg: Config, bstate: BatchedEnvState, actions,
                 env_type: str = "train") -> Tuple[BatchedEnvState, BatchedStepOut]:
    """One lockstep tick for all envs:
    traj.get_desired -> set_goal -> env.step -> episode-cap/solved override
    -> auto-reset of finished envs (reference loop main.py:140-235)."""
    dtype = bstate.env.x.dtype

    def desired(ts, s):
        return get_desired(ts, s.x, s.v, s.R, s.W, cfg.train_traj_mode)

    traj, goal = jax.vmap(desired)(bstate.traj, bstate.env)
    env = bstate.env.replace(goal=goal)

    env2, out = jax.vmap(lambda s, a: quad.step(cfg, s, a))(env, actions)

    # Episode-cap override (main.py:169-173): at max_steps the episode ends;
    # recorded done = solved criterion (|ex| <= 0.03 and no crash).
    at_cap = env2.t >= cfg.max_steps
    crashed = out.done
    ex = out.info["ex"]
    solved_pos = jnp.all(jnp.abs(ex) <= 0.03, axis=-1)
    if cfg.framework == "MODUL":
        solved_yaw = jnp.abs(out.info["eb1"]) <= 0.03
        solved = jnp.stack(
            [solved_pos & (out.reward[..., 0] != -1.0),
             solved_yaw & (out.reward[..., 1] != -1.0)], axis=-1)
    else:
        solved = (solved_pos & (out.reward[..., 0] != -1.0))[..., None]
    done_recorded = jnp.where(at_cap[..., None], solved, crashed)
    episode_over = jnp.any(crashed, axis=-1) | at_cap

    # Auto-reset: fresh episode for finished envs (params re-randomized,
    # new trajectory start) — reference does this outside the env between
    # episodes (main.py:226-229).
    def fresh(s):
        k1, k2 = jax.random.split(s.key)
        ns = quad.reset_state(cfg, k1, env_type, dtype)
        ts = TrajState.create(k2, dtype)
        ts = mark_traj_start(ts, ns.x, ns.R)
        ts, goal = get_desired(ts, ns.x, ns.v, ns.R, ns.W, cfg.train_traj_mode)
        ns = ns.replace(goal=goal)
        ns, obs = quad.initial_obs(cfg, ns)
        return ns, ts, obs

    def sel(flag, new, old):
        return jax.tree.map(
            lambda a, b: jnp.where(
                flag.reshape(flag.shape + (1,) * (a.ndim - flag.ndim)), a, b),
            new, old,
        )

    obs_cur = _obs_tuple(cfg, out.obs)

    # Dense formulation on purpose: fresh state for EVERY env, select the
    # finished ones.  A "sparse" auto-reset (compact finished indices into
    # S = B/16 lanes with jnp.nonzero, compute fresh states there, scatter
    # back) was tried in round 5 and is a measured 6-10x REGRESSION on the
    # chip: the dynamic-index gather/scatter over the state pytree breaks
    # whole-step fusion (dense 94.7M vs sparse 9.8M steps/s @ 4096; even
    # without the overflow lax.cond, 15.0M — docs/bench/
    # env_ceiling_probe.json, scripts/env_ceiling_probe.py --variants
    # sparse,sparse_nocond, rationale in docs/DESIGN.md §1.4).  The dense
    # reset chain is elementwise per env, so XLA fuses it into the step;
    # its cost is ~half the tick, which the roofline note shows is serial
    # op-issue, not FLOPs or HBM.
    fresh_env, fresh_traj, fresh_obs = jax.vmap(fresh)(env2)
    env_next = sel(episode_over, fresh_env, env2)
    traj_next = sel(episode_over, fresh_traj, traj)
    obs_next = tuple(
        jnp.where(episode_over[..., None], f, c)
        for f, c in zip(_obs_tuple(cfg, fresh_obs), obs_cur)
    )

    return (
        BatchedEnvState(env=env_next, traj=traj_next),
        BatchedStepOut(
            obs=obs_next,
            reward=out.reward,
            done=done_recorded,
            reset_happened=episode_over,
            info={
                **out.info,
                # obs of the *terminal* state (pre-reset), needed by replay:
                "terminal_obs": obs_cur,
                "crashed": crashed,
            },
        ),
    )


class Transition(NamedTuple):
    """One (s, a, r, s', d) slice for every env — the replay-buffer unit.
    ``next_obs`` is the *terminal* observation (pre-auto-reset), matching
    what the reference stores (main.py:176-179)."""
    obs: tuple
    action: jnp.ndarray
    reward: jnp.ndarray
    next_obs: tuple
    done: jnp.ndarray


def scan_unroll(num_envs: int) -> int:
    """Default tick-scan unroll factor.

    The scanned tick is issue-bound below ~16k envs (DESIGN §1 roofline),
    so unrolling lets XLA fuse ACROSS tick boundaries (tick t's reset
    chain with tick t+1's dynamics) and cuts the per-tick kernel count.
    Chip-measured sweep (round 5, MONO rk4, 1000-tick scans): at 1024 envs
    56.0 -> 69.8M steps/s (unroll 16), at 4096 96.7 -> 106.7M (16), at
    16384 +-2% (any), at 65536 no gain (compute-bound); unroll 32 COLLAPSES
    small batches (1024: 25M, 4096: 41M — code bloat past the instruction
    budget).  Unrolling replicates the same op sequence but widens XLA's
    optimization scope (FMA contraction / fusion decisions differ), so
    results are NOT bitwise under jit: measured <=2 ulp f32 per leaf over
    a 40-tick rollout with discrete state identical — the same divergence
    class as jit-vs-eager (DESIGN §2), which the parity strategy already
    scopes out (parity tests run the eager f64 path; eager execution
    ignores unroll).  The default is backend-gated: on CPU (the test
    suite, the virtual multichip mesh) the 16x body only multiplies
    compile time, so it stays 1 there."""
    if jax.default_backend() == "cpu":
        return 1
    return 16 if num_envs <= 4096 else 1


def rollout(cfg: Config, bstate: BatchedEnvState, obs: tuple, key: jax.Array,
            policy_fn, policy_state, num_steps: int, env_type: str = "train",
            unroll: int = None):
    """Scan ``num_steps`` lockstep ticks with an arbitrary policy callback
    ``policy_fn(policy_state, obs_tuple, key) -> actions``.

    Returns (final bstate, final obs, stacked time-major Transitions,
    stacked BatchedStepOut).  One jit of this is the whole throughput
    benchmark and the actor half of the training superstep.
    ``unroll``: tick-scan unroll factor; None = scan_unroll(num_envs).
    """
    if unroll is None:
        unroll = scan_unroll(cfg.num_envs)

    def body(carry, _):
        bs, ob, k = carry
        k, sub = jax.random.split(k)
        actions = policy_fn(policy_state, ob, sub)
        bs, out = batched_step(cfg, bs, actions, env_type)
        tr = Transition(obs=ob, action=actions, reward=out.reward,
                        next_obs=out.info["terminal_obs"], done=out.done)
        return (bs, out.obs, k), (tr, out)

    (bstate, obs, _), (trs, outs) = jax.lax.scan(
        body, (bstate, obs, key), None, length=num_steps,
        unroll=min(unroll, max(num_steps, 1)),
    )
    return bstate, obs, trs, outs
