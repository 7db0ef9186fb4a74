"""Env state pytrees.

The reference keeps simulation state as a mutable 18-vector attribute plus a
constellation of instance attributes (integral-error objects, goal commands,
randomized params — quad.py:90-101,135,179-216).  Here the *entire* episode
state is one immutable pytree so the step is a pure function that vmaps over
thousands of envs and scans over time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .params import QuadParams


@struct.dataclass
class Goal:
    """Desired tracking commands (reference quad.py:97-101, :413-418)."""
    xd: jnp.ndarray        # (..., 3) position command [m]
    vd: jnp.ndarray        # (..., 3) velocity command [m/s]
    b1d: jnp.ndarray       # (..., 3) heading direction
    b1d_dot: jnp.ndarray   # (..., 3) heading direction derivative
    Wd: jnp.ndarray        # (..., 3) angular velocity command [rad/s]

    @classmethod
    def default(cls, dtype=jnp.float32, batch=()):
        z = jnp.zeros(batch + (3,), dtype)
        b1d = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype), batch + (3,))
        return cls(xd=z, vd=z, b1d=b1d, b1d_dot=z, Wd=z)


@struct.dataclass
class EnvState:
    """Full per-env simulation state.

    ``R`` is stored as a raw 3x3 matrix exactly as integrated (the reference
    stores the drifted matrix and re-orthonormalizes on *read*,
    quad_utils.py:12-16); ``pack``/``unpack`` convert to the reference's
    column-major 18-vector layout (quad.py:146, :204).
    """
    x: jnp.ndarray            # (..., 3) position [m]
    v: jnp.ndarray            # (..., 3) velocity [m/s]
    R: jnp.ndarray            # (..., 3, 3) attitude
    W: jnp.ndarray            # (..., 3) body angular velocity [rad/s]
    # Leaky trapezoidal integral errors (quad_utils.py:38-63):
    eIx: jnp.ndarray          # (..., 3) position integral error
    eIx_integrand: jnp.ndarray
    eIb1: jnp.ndarray         # (...,) heading integral error
    eIb1_integrand: jnp.ndarray
    # Last applied wrench, for logging/rendering (quad.py:44-48):
    f_total: jnp.ndarray      # (...,) total thrust [N]
    M: jnp.ndarray            # (..., 3) moment [Nm]
    goal: Goal
    params: QuadParams
    t: jnp.ndarray            # (...,) int32 step count within episode
    key: jax.Array            # per-env PRNG key


def pack_state(x, v, R, W):
    """(x, v, R, W) -> 18-vector with column-major R in slots 6:15
    (reference quad.py:146,204: R.reshape(9, 1, order='F'))."""
    R_vec = jnp.swapaxes(R, -1, -2).reshape(R.shape[:-2] + (9,))
    return jnp.concatenate([x, v, R_vec, W], axis=-1)


def unpack_state(s18):
    """18-vector -> (x, v, R, W); inverse of pack_state
    (reference quad_utils.py:12-16)."""
    x = s18[..., 0:3]
    v = s18[..., 3:6]
    R = jnp.swapaxes(
        s18[..., 6:15].reshape(s18.shape[:-1] + (3, 3)), -1, -2
    )
    W = s18[..., 15:18]
    return x, v, R, W
