"""On-device replay buffer.

The reference keeps per-agent preallocated numpy ring buffers on host and
copies sampled batches to the accelerator every update
(algos/replay_buffer.py:4-56).  Here the ring lives in device HBM as ONE
row-major (capacity, total_dim) array — inserts are a single batched
scatter from the rollout scan, samples a single row gather inside the
jitted update, so training never crosses host<->device and every update
touches HBM's random-access path once instead of once per field (the
round-3 layout kept 5 fields x n_agents separate (cap, d) arrays: 10
scatters per tick + 10 gathers per update for MODUL, each paying the
full per-row HBM sector cost for a handful of floats).

Row layout (static, from cfg dims): [obs_0..obs_n | act_0..act_n |
rwd_0..rwd_n | next_obs_0.. | done_0..]; ``sample`` slices the gathered
block back into the per-agent Batch tuples, bit-identical values to the
multi-array layout.

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
    """One shared ring + write cursor (agents always share indices, like
    the reference's single `count`, replay_buffer.py:29-39 — required so
    CTDE critics see aligned joint transitions).

    ``dims`` is the static (obs_dims, act_dims) layout descriptor; the
    per-field views (``.obs``, ``.act``, ...) are slice properties kept for
    tests and introspection — the hot path reads/writes ``data`` whole."""
    data: jnp.ndarray                   # (capacity, total_dim)
    ptr: jnp.ndarray                    # int32 write cursor
    filled: jnp.ndarray                 # int32 number of valid rows
    dims: Tuple[Tuple[int, ...], Tuple[int, ...]] = struct.field(
        pytree_node=False, default=((), ()))

    # ---- static layout ----
    def _offsets(self):
        obs_dims, act_dims = self.dims
        n = len(obs_dims)
        sizes = (list(obs_dims) + list(act_dims) + [1] * n
                 + list(obs_dims) + [1] * n)
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        return offs, n

    def _field(self, which: int):
        """Tuple of per-agent column slices for field index ``which`` in
        [obs, act, rwd, next_obs, done]."""
        offs, n = self._offsets()
        base = which * n
        return tuple(self.data[..., offs[base + i]:offs[base + i + 1]]
                     for i in range(n))

    @property
    def obs(self):
        return self._field(0)

    @property
    def act(self):
        return self._field(1)

    @property
    def rwd(self):
        return self._field(2)

    @property
    def next_obs(self):
        return self._field(3)

    @property
    def done(self):
        return self._field(4)


def row_dim(obs_dims: Sequence[int], act_dims: Sequence[int]) -> int:
    n = len(obs_dims)
    return 2 * sum(obs_dims) + sum(act_dims) + 2 * n


def create(capacity: int, obs_dims: Sequence[int], act_dims: Sequence[int],
           dtype=jnp.float32) -> ReplayState:
    return ReplayState(
        data=jnp.zeros((capacity, row_dim(obs_dims, act_dims)), dtype),
        ptr=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
        dims=(tuple(int(d) for d in obs_dims),
              tuple(int(d) for d in act_dims)),
    )


def _pack(rs: ReplayState, obs_n, act_n, rwd_n, next_obs_n, done_n):
    """Concatenate per-agent fields into (k, total_dim) rows in ring
    layout.

    The inputs pass through an optimization_barrier first: without it XLA
    may CLONE the producing elementwise chains (e.g. the obs computation
    in a rollout scan body) into the concat+scatter fusion and contract
    them differently, storing a value 1 ULP off from the one the scan
    carry sees — which breaks the fused-vs-staged ring bitwise anchor
    (tests/test_algos.py::test_insert_tick_scan_matches_staged_rollout).
    The barrier forces the ring to consume the same materialized buffers
    as every other consumer; the pack is a copy either way, so this costs
    nothing."""
    k = obs_n[0].shape[0]
    dt = rs.data.dtype
    cols = (list(obs_n) + list(act_n)
            + [v.reshape(k, 1) for v in rwd_n]
            + list(next_obs_n)
            + [v.reshape(k, 1) for v in done_n])
    cols = jax.lax.optimization_barrier(tuple(c.astype(dt) for c in cols))
    return jnp.concatenate(cols, axis=-1)


def insert(rs: ReplayState, obs_n, act_n, rwd_n, next_obs_n, done_n
           ) -> ReplayState:
    """Insert a block of k transitions per agent (k = T*B flattened rollout).

    Wraparound via modular scatter indices; k must be <= capacity.
    """
    rows = _pack(rs, obs_n, act_n, rwd_n, next_obs_n, done_n)
    k = rows.shape[0]
    cap = rs.data.shape[0]
    idx = (rs.ptr + jnp.arange(k, dtype=jnp.int32)) % cap
    return rs.replace(
        data=rs.data.at[idx].set(rows),
        ptr=(rs.ptr + k) % cap,
        filled=jnp.minimum(rs.filled + k, cap),
    )


def insert_tick(rs: ReplayState, obs_t: tuple, actions, reward, next_obs_t:
                tuple, done) -> ReplayState:
    """Insert ONE lockstep tick (B rows) straight from a rollout scan body.

    Same ring content as stacking the rollout and calling
    ``insert_rollout`` (bitwise — tests/test_algos.py), but fused into the
    scan it skips materializing the (T, B, ...) transition stack in HBM
    entirely, and the whole tick is ONE scatter-write of pre-packed rows.
    ``obs_t`` / ``next_obs_t`` are per-agent (B, d) tuples; ``actions`` is
    the joint (B, sum(act_dims)) vector (split per agent like
    insert_rollout); ``reward`` / ``done`` are (B, n_agents)."""
    obs_dims, act_dims = rs.dims
    n = len(obs_dims)
    act_n, off = [], 0
    for d in act_dims:
        act_n.append(actions[..., off:off + d])
        off += d
    rwd_n = [reward[..., i] for i in range(n)]
    done_n = [done[..., i] for i in range(n)]
    return insert(rs, list(obs_t), act_n, rwd_n, list(next_obs_t), done_n)


def insert_rollout(rs: ReplayState, trs) -> ReplayState:
    """Insert a time-major batch.Transition stack ((T, B, ...) per agent)."""
    def flat(x):
        return x.reshape((-1,) + x.shape[2:])

    obs_dims, act_dims = rs.dims
    n = len(obs_dims)
    obs_n = [flat(trs.obs[i]) for i in range(n)]
    next_obs_n = [flat(trs.next_obs[i]) for i in range(n)]
    if trs.action.shape[-1] == sum(act_dims):
        # joint action vector -> split per agent (MODUL: [4 | 1])
        splits = []
        off = 0
        for d in act_dims:
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
    (replay_buffer.py:41-56): ONE (batch, total_dim) row gather, sliced
    back into per-agent fields.

    Sampling an *empty* buffer is a driver bug (updates must be gated on
    warmup/first insert); rather than silently returning row-0 zeros, the
    batch is NaN-poisoned so the ensuing loss blows up loudly in-graph."""
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(rs.filled, 1))
    poison = jnp.where(rs.filled > 0, 1.0, jnp.nan)
    rows = poison * rs.data[idx]
    view = rs.replace(data=rows)
    return Batch(
        obs=view.obs, act=view.act, rwd=view.rwd,
        next_obs=view.next_obs, done=view.done,
    )
