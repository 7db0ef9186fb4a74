"""On-device replay buffer.

The reference keeps per-agent preallocated numpy ring buffers on host and
copies sampled batches to the accelerator every update
(algos/replay_buffer.py:4-56).  Here the ring lives in device HBM as a pytree
of arrays — inserts are batched scatters from the rollout scan, samples are
gathers inside the jitted update, so training never crosses host<->device.

Divergence (documented): the reference samples *without* replacement
(np.random.choice(replace=False), replay_buffer.py:43); we sample uniform
integers with replacement — at batch 256 from 1e6 entries the collision
probability per batch is ~3%, with no measurable effect on TD learning, and
it avoids a device-side permutation of the whole buffer.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    """Per-agent ring buffers + shared write cursor (agents always share
    indices, like the reference's single `count`, replay_buffer.py:29-39 —
    required so CTDE critics see aligned joint transitions)."""
    obs: Tuple[jnp.ndarray, ...]        # per-agent (cap, obs_dim)
    act: Tuple[jnp.ndarray, ...]        # per-agent (cap, act_dim)
    rwd: Tuple[jnp.ndarray, ...]        # per-agent (cap, 1)
    next_obs: Tuple[jnp.ndarray, ...]
    done: Tuple[jnp.ndarray, ...]
    ptr: jnp.ndarray                    # int32 write cursor
    filled: jnp.ndarray                 # int32 number of valid rows


def create(capacity: int, obs_dims: Sequence[int], act_dims: Sequence[int],
           dtype=jnp.float32) -> ReplayState:
    def per_agent(dims):
        return tuple(jnp.zeros((capacity, d), dtype) for d in dims)

    n = len(obs_dims)
    return ReplayState(
        obs=per_agent(obs_dims),
        act=per_agent(act_dims),
        rwd=tuple(jnp.zeros((capacity, 1), dtype) for _ in range(n)),
        next_obs=per_agent(obs_dims),
        done=tuple(jnp.zeros((capacity, 1), dtype) for _ in range(n)),
        ptr=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
    )


def insert(rs: ReplayState, obs_n, act_n, rwd_n, next_obs_n, done_n
           ) -> ReplayState:
    """Insert a block of k transitions per agent (k = T*B flattened rollout).

    Wraparound via modular scatter indices; k must be <= capacity.
    """
    k = obs_n[0].shape[0]
    cap = rs.obs[0].shape[0]
    idx = (rs.ptr + jnp.arange(k, dtype=jnp.int32)) % cap

    def put(buf, val):
        return buf.at[idx].set(val.astype(buf.dtype))

    return rs.replace(
        obs=tuple(put(b, v) for b, v in zip(rs.obs, obs_n)),
        act=tuple(put(b, v) for b, v in zip(rs.act, act_n)),
        rwd=tuple(put(b, v.reshape(k, 1)) for b, v in zip(rs.rwd, rwd_n)),
        next_obs=tuple(put(b, v) for b, v in zip(rs.next_obs, next_obs_n)),
        done=tuple(put(b, v.reshape(k, 1).astype(b.dtype))
                   for b, v in zip(rs.done, done_n)),
        ptr=(rs.ptr + k) % cap,
        filled=jnp.minimum(rs.filled + k, cap),
    )


def insert_tick(rs: ReplayState, obs_t: tuple, actions, reward, next_obs_t:
                tuple, done) -> ReplayState:
    """Insert ONE lockstep tick (B rows) straight from a rollout scan body.

    Same ring content as stacking the rollout and calling
    ``insert_rollout`` (bitwise — tests/test_algos.py), but fused into the
    scan it skips materializing the (T, B, ...) transition stack in HBM
    entirely: the staged path costs write-stack + read-stack +
    scatter-write per element, this is the single scatter-write.  ``obs_t``
    / ``next_obs_t`` are per-agent (B, d) tuples; ``actions`` is the joint
    (B, sum(act_dims)) vector (split per agent like insert_rollout);
    ``reward`` / ``done`` are (B, n_agents)."""
    n = len(rs.obs)
    act_n, off = [], 0
    for a in rs.act:
        d = a.shape[-1]
        act_n.append(actions[..., off:off + d])
        off += d
    rwd_n = [reward[..., i] for i in range(n)]
    done_n = [done[..., i] for i in range(n)]
    return insert(rs, list(obs_t), act_n, rwd_n, list(next_obs_t), done_n)


def insert_rollout(rs: ReplayState, trs) -> ReplayState:
    """Insert a time-major batch.Transition stack ((T, B, ...) per agent)."""
    def flat(x):
        return x.reshape((-1,) + x.shape[2:])

    n = len(rs.obs)
    obs_n = [flat(trs.obs[i]) for i in range(n)]
    next_obs_n = [flat(trs.next_obs[i]) for i in range(n)]
    if trs.action.shape[-1] == sum(a.shape[-1] for a in rs.act):
        # joint action vector -> split per agent (MODUL: [4 | 1])
        splits = []
        off = 0
        for a in rs.act:
            d = a.shape[-1]
            splits.append(flat(trs.action)[..., off:off + d])
            off += d
        act_n = splits
    else:
        act_n = [flat(trs.action)]
    rwd_n = [flat(trs.reward[..., i]) for i in range(n)]
    done_n = [flat(trs.done[..., i]) for i in range(n)]
    return insert(rs, obs_n, act_n, rwd_n, next_obs_n, done_n)


class Batch(struct.PyTreeNode):
    obs: Tuple[jnp.ndarray, ...]
    act: Tuple[jnp.ndarray, ...]
    rwd: Tuple[jnp.ndarray, ...]
    next_obs: Tuple[jnp.ndarray, ...]
    done: Tuple[jnp.ndarray, ...]


def sample(rs: ReplayState, key: jax.Array, batch_size: int) -> Batch:
    """Uniform sample of shared indices across agents
    (replay_buffer.py:41-56).

    Sampling an *empty* buffer is a driver bug (updates must be gated on
    warmup/first insert); rather than silently returning row-0 zeros, the
    batch is NaN-poisoned so the ensuing loss blows up loudly in-graph."""
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(rs.filled, 1))
    poison = jnp.where(rs.filled > 0, 1.0, jnp.nan)
    take = lambda bufs: tuple(poison * b[idx] for b in bufs)
    return Batch(
        obs=take(rs.obs), act=take(rs.act), rwd=take(rs.rwd),
        next_obs=take(rs.next_obs), done=take(rs.done),
    )
