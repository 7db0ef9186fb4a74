"""Rigid-body quadrotor equations of motion + fixed-step integrators.

EoM (reference gym_rotor/envs/quad.py:321-335 and
gym_rotor/wrappers/decoupled_yaw_wrapper.py:143-161):

    x_dot = v
    v_dot = g e3 - f R e3 / m
    R_dot = R hat(W)
    W_dot = J^{-1} (-hat(W) J W + M)

All arithmetic below is written with *explicit, fixed association order* so
the float64 Euler path is bit-identical to the NumPy oracle
(``gym_rotor_tpu.envs.oracle``) that re-expresses the reference math with the
same ordering — the basis for the fixed-seed parity tests (SURVEY.md §4).

Integrators:
  * ``euler``  — matches the reference's explicit-Euler branch (quad.py:252-262).
  * ``rk4``    — default TPU fast path; fixed-step classical RK4.
  * ``dop853`` — fixed-step 12-stage Dormand-Prince 8th-order step, the
    deterministic jit-able stand-in for the reference's adaptive
    ``solve_ivp(..., method='DOP853')`` (quad.py:263-266).  At dt = 5 ms the
    dynamics are so smooth that scipy's adaptive DOP853 takes a single step,
    so one fixed step reproduces it to ~1e-12 (tolerance-tested).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import so3
from .params import G_STD, QuadParams


# Single source of truth for the fixed-order 3x3 matmul lives in ops.so3.
mm3 = so3.mm3


def mv3(A, b):
    """3x3 (mat)·(vec) with fixed summation order."""
    return (
        A[..., :, 0] * b[..., 0:1] + A[..., :, 1] * b[..., 1:2]
    ) + A[..., :, 2] * b[..., 2:3]


def dot3(a, b):
    """3-vector dot with fixed summation order."""
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]) + a[..., 2] * b[..., 2]


class Deriv(NamedTuple):
    x: jnp.ndarray
    v: jnp.ndarray
    R: jnp.ndarray
    W: jnp.ndarray


def eom(x, v, R, W, f, M, params: QuadParams) -> Deriv:
    """Equations of motion with constant wrench (f, M) over the step
    (reference quad.py:321-335)."""
    del x
    x_dot = v
    # v_dot = g e3 - (f * R e3) / m ;  R e3 is exactly the third column.
    g_e3 = jnp.stack(
        [jnp.zeros_like(f), jnp.zeros_like(f), jnp.full_like(f, G_STD)], axis=-1
    )
    v_dot = g_e3 - (f[..., None] * R[..., :, 2]) / params.m[..., None]
    R_dot = mm3(R, so3.hat(W))
    # W_dot = J^{-1}(-hat(W) J W + M); J diagonal so J^{-1} v = v * (1/J).
    Jmat = jnp.zeros_like(R).at[..., 0, 0].set(params.J[..., 0]) \
                            .at[..., 1, 1].set(params.J[..., 1]) \
                            .at[..., 2, 2].set(params.J[..., 2])
    hW = so3.hat(W)
    t1 = mm3(-hW, Jmat)
    t2 = mv3(t1, W)
    W_dot = (t2 + M) * (1.0 / params.J)
    return Deriv(x=x_dot, v=v_dot, R=R_dot, W=W_dot)


def _axpy(y, d: Deriv, a):
    return (y[0] + a * d.x, y[1] + a * d.v, y[2] + a * d.R, y[3] + a * d.W)


def euler_step(x, v, R, W, f, M, params, dt):
    """One explicit-Euler step (reference quad.py:252-262)."""
    d = eom(x, v, R, W, f, M, params)
    return _axpy((x, v, R, W), d, dt)


def rk4_step(x, v, R, W, f, M, params, dt):
    """Classical fixed-step RK4."""
    half = dt * 0.5
    k1 = eom(x, v, R, W, f, M, params)
    y2 = _axpy((x, v, R, W), k1, half)
    k2 = eom(*y2, f, M, params)
    y3 = _axpy((x, v, R, W), k2, half)
    k3 = eom(*y3, f, M, params)
    y4 = _axpy((x, v, R, W), k3, dt)
    k4 = eom(*y4, f, M, params)
    sixth = dt / 6.0
    third = dt / 3.0
    out = (x, v, R, W)
    out = _axpy(out, k1, sixth)
    out = _axpy(out, k2, third)
    out = _axpy(out, k3, third)
    out = _axpy(out, k4, sixth)
    return out


def _dop853_tableau():
    """Pull the DOP853 Butcher tableau from scipy (no hand-typed constants).

    scipy.integrate._ivp.dop853_coefficients defines the 12-stage 8th-order
    method used by solve_ivp(method='DOP853'); only A[:12,:12], B, C[:12] are
    needed for a fixed-step propagation.
    """
    from scipy.integrate._ivp import dop853_coefficients as dc

    n = dc.N_STAGES  # 12
    A = np.asarray(dc.A, dtype=np.float64)[:n, :n]
    B = np.asarray(dc.B, dtype=np.float64)
    C = np.asarray(dc.C, dtype=np.float64)[:n]
    return A, B, C


try:
    _DOP853_A, _DOP853_B, _DOP853_C = _dop853_tableau()
    HAS_DOP853 = True
except Exception:  # pragma: no cover - scipy always present in target env
    _DOP853_A = _DOP853_B = _DOP853_C = None
    HAS_DOP853 = False


def dop853_step(x, v, R, W, f, M, params, dt):
    """One fixed step of the 12-stage Dormand-Prince 8th-order method."""
    A, B = _DOP853_A, _DOP853_B
    y0 = (x, v, R, W)
    ks = []
    for i in range(len(B)):
        yi = y0
        for j in range(i):
            aij = A[i, j]
            if aij != 0.0:
                yi = _axpy(yi, ks[j], dt * aij)
        ks.append(eom(*yi, f, M, params))
    out = y0
    for i, bi in enumerate(B):
        if bi != 0.0:
            out = _axpy(out, ks[i], dt * bi)
    return out


_INTEGRATORS = {
    "euler": euler_step,
    "rk4": rk4_step,
    "dop853": dop853_step,
}


def integrate(name: str, x, v, R, W, f, M, params, dt, substeps: int = 1):
    """Advance the state by dt using the named integrator.

    ``substeps`` subdivides dt for extra accuracy; the loop is unrolled at
    trace time (substeps is static)."""
    step = _INTEGRATORS[name]
    h = dt / substeps
    y = (x, v, R, W)
    for _ in range(substeps):
        y = step(*y, f, M, params, h)
    return y
