"""Exact replay of the reference's fixed-seed evaluation episode stream.

The reference evaluates 10 *sequential* episodes on a single env: it seeds
the global numpy RNG once (``set_seed(eval_env, 1992)``, utils/utils.py:8-18
-> ``np.random.seed``) and then each episode consumes exactly 13 uniforms
from that global stream, in this order:

1. ``yaw       = uniform(size=1, low=-pi,  high=pi)``   sample_init_error, quad.py:339
2. ``x         = uniform(size=3, low=-0.4, high=0.4)``  reset, quad.py:188 (init_x=0.4 eval, :354)
3. ``v         = uniform(size=3, low=-0.0, high=0.0)``  quad.py:191 (init_v=0 eval -> zeros, draws consumed)
4. ``W         = uniform(size=3, low=-0.0, high=0.0)``  quad.py:194
5. ``roll_pitch= uniform(size=2, low=-0.0, high=0.0)``  quad.py:196
6. ``theta_b1d = uniform(size=1, low=-25deg, high=25deg)``  first mode-0
   get_desired after mark_traj_start, trajectory_generator.py:141-148

(``set_random_parameters('eval')`` draws nothing — nominal values,
quad.py:361-366; ``mark_traj_start`` draws nothing, :176-191; the driver's
``super().reset(seed=...)`` seeds gymnasium's ``self.np_random``, which the
reference never reads — all draws above use the module-global stream.)

Because the count is fixed per episode, the whole 10-episode stream is
replayable without simulating: this module reproduces the 10 initial
conditions bit-exactly on host (golden-tested against the actual reference
in tests/test_ref_stream.py) and ``batched_reset_reference`` lifts them into
one batched env state, so a TPU eval rolls the reference's exact episodes in
parallel instead of 10 same-distribution-but-different draws.  Enabled with
``--eval_stream reference`` (mode-0 eval protocol only — the tracking modes
draw extra per-mode randoms the first time their branch runs; the published
benchmark protocol, main.py:280-314 with train_traj_mode=0, is covered).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import so3
from ..utils.config import Config
from . import params as params_lib
from . import quad
from .batch import BatchedEnvState, _obs_tuple
from .oracle import euler_to_rot, psvd
from .trajectory import TrajState, get_desired, mark_traj_start

D2R = np.pi / 180.0


def reference_eval_inits(num_eval: int, seed: int = 1992):
    """Replay ``num_eval`` reference eval-episode resets from ``seed``.

    Returns dict of stacked float64 arrays: ``x/v/W (N,3)``, ``R (N,3,3)``,
    ``b1d (N,3)`` — bit-identical to what the reference env/trajectory
    generator would produce for episodes 0..N-1 of one eval_policy call.
    """
    # np.random.seed(s) + np.random.uniform is the legacy MT19937 global
    # RandomState; a private RandomState(seed) yields the identical stream
    # without clobbering global RNG state.
    rs = np.random.RandomState(seed)
    xs, vs, Ws, Rs, b1ds = [], [], [], [], []
    for _ in range(num_eval):
        yaw = rs.uniform(size=1, low=-np.pi, high=np.pi)
        x = rs.uniform(size=3, low=-0.4, high=0.4)
        v = rs.uniform(size=3, low=-0.0, high=0.0)
        W = rs.uniform(size=3, low=-0.0, high=0.0)
        roll_pitch = rs.uniform(size=2, low=-0.0, high=0.0)
        euler = np.concatenate((roll_pitch, yaw), axis=None)
        # the reference reset builds R via scipy's quaternion path
        # (quad.py:198) whose rounding differs from Rz@Ry@Rx in the last
        # ulp — use scipy when available so the replay is bit-exact
        try:
            from scipy.spatial.transform import Rotation
            R = Rotation.from_euler("xyz", euler, degrees=False).as_matrix()
        except ImportError:                           # pragma: no cover
            R = euler_to_rot(euler)
        # isRotationMatrix check + psvd repair (quad.py:200-204)
        if not np.linalg.norm(np.eye(3) - R.T @ R) < 1e-6:
            U, _, V = psvd(R)
            R = U @ V.T
        # first mode-0 get_desired: b1d = R_e3(theta) @ get_current_b1(R)
        # (trajectory_generator.py:141-148, quad_utils.py:97-101)
        theta_b1d = rs.uniform(size=1, low=-25 * D2R, high=25 * D2R)
        b1 = R.dot(np.array([1.0, 0.0, 0.0]))
        theta = np.arctan2(b1[1], b1[0])
        b1d_temp = np.array([np.cos(theta), np.sin(theta), 0.0])
        c, s = np.cos(theta_b1d[0]), np.sin(theta_b1d[0])
        R_e3 = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        b1d = R_e3 @ b1d_temp
        xs.append(x); vs.append(v); Ws.append(W); Rs.append(R); b1ds.append(b1d)
    return {
        "x": np.stack(xs), "v": np.stack(vs), "W": np.stack(Ws),
        "R": np.stack(Rs), "b1d": np.stack(b1ds),
    }


def batched_reset_reference(cfg: Config, seed: Optional[int] = None,
                            dtype=jnp.float32):
    """Batched eval reset from the reference's exact episode stream: one env
    per reference eval episode (N = cfg.num_envs; ``train.build_eval_rollout``
    passes a config with num_envs = num_eval so env i replays reference eval
    episode i), nominal params, zero integrals, goal = mode-0 zero setpoint
    with the stream's heading.

    Mirrors the reference driver order reset -> mark_traj_start ->
    get_desired -> set_goal_state -> get_norm_error_state (main.py:308-314)
    with the per-episode draws replayed on host.  Drop-in replacement for
    ``batch.batched_reset`` on the eval path.
    """
    if cfg.train_traj_mode != 0:
        raise ValueError(
            "eval_stream='reference' replays the mode-0 eval protocol; "
            f"train_traj_mode={cfg.train_traj_mode} draws extra per-mode "
            "randoms the replay does not model — use eval_stream='parallel'.")
    seed = cfg.seed if seed is None else seed
    inits = reference_eval_inits(cfg.num_envs, seed)

    def one(x, v, R, W, b1d, key):
        if cfg.exact_so3:
            R = so3.ensure_so3_exact(R)  # like reset_state (quad.py:439-440)
        p = params_lib.nominal(dtype)
        ek, tk = jax.random.split(key)  # disjoint env/traj streams, like
        state = quad.fresh_state(p, x, v, R, W, ek, dtype)  # batched_reset
        ts = TrajState.create(tk, dtype)
        ts = mark_traj_start(ts, state.x, state.R)
        # the mode-0 heading draw already happened on host: freeze it
        # (init_b1d False) and pin the zero setpoint
        # (set_desired_states_to_zero, trajectory_generator.py:142-148)
        ts = ts.replace(
            init_b1d=jnp.zeros_like(ts.init_b1d),
            b1d=b1d, xd=jnp.zeros(3, dtype), vd=jnp.zeros(3, dtype),
            Wd=jnp.zeros(3, dtype),
        )
        ts, goal = get_desired(ts, state.x, state.v, state.R, state.W, 0)
        state = state.replace(goal=goal)
        state, obs = quad.initial_obs(cfg, state)
        return BatchedEnvState(env=state, traj=ts), obs

    n = cfg.num_envs
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    bstate, obs = jax.vmap(one)(
        jnp.asarray(inits["x"], dtype), jnp.asarray(inits["v"], dtype),
        jnp.asarray(inits["R"], dtype), jnp.asarray(inits["W"], dtype),
        jnp.asarray(inits["b1d"], dtype), keys,
    )
    return bstate, _obs_tuple(cfg, obs)
