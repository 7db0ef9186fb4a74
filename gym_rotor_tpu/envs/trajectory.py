"""Vectorized reference-signal generator (desired trajectories).

Re-design of the reference's stateful ``TrajectoryGenerator``
(utils/trajectory_generator.py:10-510) as a pure state machine: all of the
reference's implicit instance flags (``trajectory_started``, ``t_traj``,
``manual_mode``, per-mode init captures) are explicit fields of ``TrajState``,
mode dispatch is a ``lax.switch`` (all branches are cheap elementwise math, so
computing every branch under vmap costs nothing on TPU), and the randomized
quantities (hover settle time / yaw rate, mode-0 heading offset) draw from the
carried PRNG key.

Modes (trajectory_generator.py:16-30):
    0 manual/idle-warmup   1 hovering     2 take-off    3 landing
    4 stay                 5 circle       6+ eight-shaped (Lissajous)
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import so3
from .dynamics import dot3, mm3, mv3
from .quad import DT
from .state import Goal

# Mode constants (trajectory_generator.py:83-110)
TAKEOFF_END_HEIGHT = -0.5
TAKEOFF_VELOCITY = -0.05
LANDING_VELOCITY = 1.0
LANDING_CUTOFF_HEIGHT = -0.25
NUM_CIRCLES = 2
CIRCLE_RADIUS = 0.7
CIRCLE_LINEAR_V = 0.4
CIRCLE_W = 0.4
NUM_EIGHTS = 3
EIGHT_A1 = 1.5
EIGHT_A2 = 1.0
EIGHT_T = 9.0
EIGHT_W1 = 2.0 * math.pi / EIGHT_T
EIGHT_W2 = 4.0 * math.pi / EIGHT_T
EIGHT_W_B1D = 0.349066          # 20 deg/s
EIGHT_EPS = 0.01
# math.log (not jnp.log): module-scope jnp ops initialize the TPU backend at
# import time, which crashes any CLI entrypoint when the backend is wedged.
EIGHT_EXP_XY = -math.log(EIGHT_EPS) / EIGHT_T
EIGHT_ALT_D = -0.6
EIGHT_EXP_Z = -math.log(EIGHT_EPS) / (3.0 * EIGHT_T)


@struct.dataclass
class TrajState:
    """All reference instance state made explicit (per-env, batchable)."""
    mode: jnp.ndarray          # int32
    t: jnp.ndarray             # time since trajectory start [s]
    t_traj: jnp.ndarray        # planned trajectory duration [s]
    started: jnp.ndarray       # bool: per-mode init done
    complete: jnp.ndarray      # bool: mark_traj_end called
    manual_mode: jnp.ndarray   # bool
    manual_init: jnp.ndarray   # bool: manual-mode init done
    is_landed: jnp.ndarray     # bool
    init_b1d: jnp.ndarray      # bool: mode-0 heading not yet sampled
    x_init: jnp.ndarray        # (3,) captured position at traj start
    theta_init: jnp.ndarray    # initial heading angle
    x_goal: jnp.ndarray        # (3,) hover goal
    smooth_term: jnp.ndarray   # hover exponential rate
    w_b1d: jnp.ndarray         # yaw rate (hover / eight)
    center: jnp.ndarray        # (3,) circle / eight-shape center
    # Persistent outputs (the reference mutates xd/vd/... fields in place and
    # modes only overwrite parts of them):
    xd: jnp.ndarray
    vd: jnp.ndarray
    b1d: jnp.ndarray
    b1d_dot: jnp.ndarray
    Wd: jnp.ndarray
    key: jax.Array

    @classmethod
    def create(cls, key, dtype=jnp.float32):
        z = jnp.zeros((), dtype)
        z3 = jnp.zeros(3, dtype)
        return cls(
            mode=jnp.zeros((), jnp.int32), t=z, t_traj=z,
            started=jnp.zeros((), bool), complete=jnp.zeros((), bool),
            manual_mode=jnp.zeros((), bool), manual_init=jnp.zeros((), bool),
            is_landed=jnp.zeros((), bool), init_b1d=jnp.ones((), bool),
            x_init=z3, theta_init=z, x_goal=z3, smooth_term=z,
            w_b1d=z, center=z3,
            xd=z3, vd=z3, b1d=jnp.array([1.0, 0.0, 0.0], dtype),
            b1d_dot=z3, Wd=z3, key=key,
        )


def mark_traj_start(ts: TrajState, x, R) -> TrajState:
    """Reset the machine at episode/mode change
    (trajectory_generator.py:176-191 + update_initial_state :201-204)."""
    b1 = R[..., :, 0]
    theta_init = jnp.arctan2(b1[..., 1], b1[..., 0])
    z = jnp.zeros_like(ts.t)
    false = jnp.zeros_like(ts.started)
    return ts.replace(
        started=false, complete=false, manual_mode=false, manual_init=false,
        is_landed=false, init_b1d=jnp.ones_like(ts.init_b1d),
        t=z, t_traj=z, x_init=x, theta_init=theta_init,
    )


def _heading_of(R):
    b1 = R[..., :, 0]
    theta = jnp.arctan2(b1[..., 1], b1[..., 0])
    return jnp.stack([jnp.cos(theta), jnp.sin(theta), jnp.zeros_like(theta)],
                     axis=-1)


def _set_to_current(ts, x, v, R):
    """set_desired_states_to_current (trajectory_generator.py:212-221)."""
    return ts.replace(xd=x, vd=v, b1d=_heading_of(R))


def _set_to_zero(ts):
    z3 = jnp.zeros_like(ts.xd)
    b1d = jnp.zeros_like(ts.b1d).at[..., 0].set(1.0)
    return ts.replace(xd=z3, vd=z3, Wd=jnp.zeros_like(ts.Wd), b1d=b1d)


# ----------------------------------------------------------------------------
# Mode branches.  Each takes (ts, x, v, R) and returns the updated TrajState
# with t already advanced (update_current_time, :224-229, sim-time path).
# Start-of-trajectory init is folded in via jnp.where on ts.started.
# ----------------------------------------------------------------------------
def _mode_idle(ts: TrajState, x, v, R) -> TrajState:
    """Mode 0 (trajectory_generator.py:141-148): zero goal, heading = current
    heading rotated by a random yaw offset in ±25 deg."""
    key, sub = jax.random.split(ts.key)
    theta = jax.random.uniform(
        sub, ts.t.shape, ts.t.dtype,
        -25.0 * jnp.pi / 180.0, 25.0 * jnp.pi / 180.0,
    )
    b1d_cur = _heading_of(R)
    b1d_new = mv3(so3.rot_z(theta), b1d_cur)
    zeroed = _set_to_zero(ts)
    take = ts.init_b1d
    return ts.replace(
        xd=jnp.where(take[..., None], zeroed.xd, ts.xd),
        vd=jnp.where(take[..., None], zeroed.vd, ts.vd),
        Wd=jnp.where(take[..., None], zeroed.Wd, ts.Wd),
        b1d=jnp.where(take[..., None], b1d_new, ts.b1d),
        init_b1d=jnp.where(take, False, ts.init_b1d),
        key=key,
    )


def _mode_hover(ts: TrajState, x, v, R) -> TrajState:
    """Mode 1 (trajectory_generator.py:252-277): exponential settle to the
    origin with randomized settle time U(2,5) s and yaw rate U(±0.15π)."""
    key, k1, k2 = jax.random.split(ts.key, 3)
    dtype = ts.t.dtype
    t_traj_new = jax.random.uniform(k1, ts.t.shape, dtype, 2.0, 5.0)
    w_new = jax.random.uniform(k2, ts.t.shape, dtype,
                               -0.15 * jnp.pi, 0.15 * jnp.pi)
    st = ts.started
    x_init = jnp.where(st[..., None], ts.x_init, x)
    x_goal = jnp.zeros_like(x)
    t_traj = jnp.where(st, ts.t_traj, t_traj_new)
    smooth = jnp.where(st, ts.smooth_term, -jnp.log(0.001) / t_traj_new)
    w_b1d = jnp.where(st, ts.w_b1d, w_new)
    t = ts.t + DT
    e = jnp.exp(-smooth * t)
    xd = (x_init - x_goal) * e[..., None] + x_goal
    vd = -(x_init - x_goal) * (smooth * e)[..., None]
    phase = w_b1d * t + ts.theta_init
    b1d = jnp.stack([jnp.cos(phase), jnp.sin(phase), jnp.zeros_like(phase)],
                    axis=-1)
    b1d_dot = jnp.stack(
        [-w_b1d * jnp.sin(phase), w_b1d * jnp.cos(phase),
         jnp.zeros_like(phase)], axis=-1)
    return ts.replace(
        started=jnp.ones_like(st), x_init=x_init, x_goal=x_goal,
        t_traj=t_traj, smooth_term=smooth, w_b1d=w_b1d, t=t,
        xd=xd, vd=vd, b1d=b1d, b1d_dot=b1d_dot, key=key,
    )


def _mode_takeoff(ts: TrajState, x, v, R) -> TrajState:
    """Mode 2 (trajectory_generator.py:280-309): constant-velocity climb to
    TAKEOFF_END_HEIGHT, then hold + switch to manual."""
    st = ts.started
    zeroed = _set_to_zero(ts)
    xd0 = zeroed.xd.at[..., 0].set(x[..., 0]).at[..., 1].set(x[..., 1])
    x_init = jnp.where(st[..., None], ts.x_init, x)
    t_traj = jnp.where(
        st, ts.t_traj, (TAKEOFF_END_HEIGHT - x[..., 2]) / TAKEOFF_VELOCITY
    )
    b1d = jnp.where(st[..., None], ts.b1d, _heading_of(R))
    xd = jnp.where(st[..., None], ts.xd, xd0)
    vd = jnp.where(st[..., None], ts.vd, zeroed.vd)
    t = ts.t + DT
    climbing = t < t_traj
    xd2 = jnp.where(climbing, x_init[..., 2] + TAKEOFF_VELOCITY * t,
                    ts.xd[..., 2])
    # waypoint_reached + hold (trajectory_generator.py:298-309)
    delta = xd - x
    reached = jnp.sqrt(jnp.sum(delta * delta, axis=-1)) < 0.04
    hold = (~climbing) & reached
    xd2 = jnp.where(hold, TAKEOFF_END_HEIGHT, xd2)
    vd2 = jnp.where(hold, 0.0, vd[..., 2])
    complete = ts.complete | hold
    return ts.replace(
        started=jnp.ones_like(st), x_init=x_init, t_traj=t_traj, t=t,
        xd=xd.at[..., 2].set(xd2), vd=vd.at[..., 2].set(vd2), b1d=b1d,
        complete=complete, manual_mode=ts.manual_mode | hold,
    )


def _mode_land(ts: TrajState, x, v, R) -> TrajState:
    """Mode 3 (trajectory_generator.py:321-348): constant-velocity descent to
    the motor-cutoff height."""
    st = ts.started
    cur = _set_to_current(ts, x, v, R)
    xd = jnp.where(st[..., None], ts.xd, cur.xd)
    vd = jnp.where(st[..., None], ts.vd, cur.vd)
    b1d = jnp.where(st[..., None], ts.b1d, _heading_of(R))
    x_init = jnp.where(st[..., None], ts.x_init, x)
    t_traj = jnp.where(
        st, ts.t_traj, (LANDING_CUTOFF_HEIGHT - x[..., 2]) / LANDING_VELOCITY
    )
    t = ts.t + DT
    descending = t < t_traj
    xd2 = jnp.where(descending, x_init[..., 2] + LANDING_VELOCITY * t,
                    LANDING_CUTOFF_HEIGHT)
    above = x[..., 2] > LANDING_CUTOFF_HEIGHT
    vd2 = jnp.where(descending, vd[..., 2],
                    jnp.where(above, 0.0, LANDING_VELOCITY))
    landed = (~descending) & above
    return ts.replace(
        started=jnp.ones_like(st), x_init=x_init, t_traj=t_traj, t=t,
        xd=xd.at[..., 2].set(xd2), vd=vd.at[..., 2].set(vd2), b1d=b1d,
        complete=ts.complete | landed, is_landed=ts.is_landed | landed,
    )


def _mode_stay(ts: TrajState, x, v, R) -> TrajState:
    """Mode 4 (trajectory_generator.py:351-356): hold current pose."""
    st = ts.started
    cur = _set_to_current(ts, x, v, R)
    return ts.replace(
        started=jnp.ones_like(st),
        xd=jnp.where(st[..., None], ts.xd, cur.xd),
        vd=jnp.where(st[..., None], ts.vd, cur.vd),
        b1d=jnp.where(st[..., None], ts.b1d, cur.b1d),
        complete=jnp.ones_like(ts.complete),
        manual_mode=jnp.ones_like(ts.manual_mode),
    )


def _mode_circle(ts: TrajState, x, v, R) -> TrajState:
    """Mode 5 (trajectory_generator.py:359-412): straight lead-in then
    NUM_CIRCLES revolutions with rotating heading."""
    st = ts.started
    cur = _set_to_current(ts, x, v, R)
    center = jnp.where(st[..., None], ts.center, x)
    t_traj_new = CIRCLE_RADIUS / CIRCLE_LINEAR_V \
        + NUM_CIRCLES * 2.0 * jnp.pi / CIRCLE_W
    t_traj = jnp.where(st, ts.t_traj, t_traj_new)
    xd = jnp.where(st[..., None], ts.xd, cur.xd)
    vd = jnp.where(st[..., None], ts.vd, cur.vd)
    b1d = jnp.where(st[..., None], ts.b1d, cur.b1d)
    t = ts.t + DT

    lead_t = CIRCLE_RADIUS / CIRCLE_LINEAR_V
    in_lead = t < lead_t
    in_circle = (~in_lead) & (t < t_traj)

    # lead-in along +x
    xd0_lead = center[..., 0] + CIRCLE_LINEAR_V * t
    vd0_lead = jnp.full_like(t, CIRCLE_LINEAR_V)

    tc = t - lead_t
    th = CIRCLE_W * tc
    xd0_circ = CIRCLE_RADIUS * jnp.cos(th) + center[..., 0]
    vd0_circ = -CIRCLE_RADIUS * CIRCLE_W * jnp.sin(th)
    xd1_circ = CIRCLE_RADIUS * jnp.sin(th) + center[..., 1]
    vd1_circ = CIRCLE_RADIUS * CIRCLE_W * jnp.cos(th)
    th_b1d = CIRCLE_W * tc + jnp.pi
    b1d_circ = jnp.stack(
        [jnp.cos(th_b1d), jnp.sin(th_b1d), jnp.zeros_like(th_b1d)], axis=-1)
    b1d_dot_circ = jnp.stack(
        [-CIRCLE_W * jnp.sin(th_b1d), CIRCLE_W * jnp.cos(th_b1d),
         jnp.zeros_like(th_b1d)], axis=-1)

    xd0 = jnp.where(in_lead, xd0_lead, jnp.where(in_circle, xd0_circ, xd[..., 0]))
    vd0 = jnp.where(in_lead, vd0_lead, jnp.where(in_circle, vd0_circ, vd[..., 0]))
    xd1 = jnp.where(in_circle, xd1_circ, xd[..., 1])
    vd1 = jnp.where(in_circle, vd1_circ, vd[..., 1])
    b1d = jnp.where(in_circle[..., None], b1d_circ, b1d)
    b1d_dot = jnp.where(in_circle[..., None], b1d_dot_circ, ts.b1d_dot)
    ended = (~in_lead) & (~in_circle)
    return ts.replace(
        started=jnp.ones_like(st), center=center, t_traj=t_traj, t=t,
        xd=xd.at[..., 0].set(xd0).at[..., 1].set(xd1),
        vd=vd.at[..., 0].set(vd0).at[..., 1].set(vd1),
        b1d=b1d, b1d_dot=b1d_dot,
        complete=ts.complete | ended, manual_mode=ts.manual_mode | ended,
    )


def _mode_eight(ts: TrajState, x, v, R) -> TrajState:
    """Mode 6+ (trajectory_generator.py:415-505): exponentially-smoothed
    Lissajous figure-eight with synchronized altitude + rotating heading."""
    st = ts.started
    cur = _set_to_current(ts, x, v, R)
    center = jnp.where(st[..., None], ts.center, x)
    t_traj = jnp.where(st, ts.t_traj, NUM_EIGHTS * EIGHT_T)
    w_b1d = jnp.where(st, ts.w_b1d, EIGHT_W_B1D)
    xd = jnp.where(st[..., None], ts.xd, cur.xd)
    vd = jnp.where(st[..., None], ts.vd, cur.vd)
    b1d = jnp.where(st[..., None], ts.b1d, cur.b1d)
    t = ts.t + DT
    active = t < t_traj

    exp_term = 1.0 - jnp.exp(-EIGHT_EXP_XY * t)
    d_exp = EIGHT_EXP_XY * jnp.exp(-EIGHT_EXP_XY * t)
    # x-axis <- A2 sin(w2 t), y-axis <- A1 (cos(w1 t)-1)  (:452-458)
    xd0 = EIGHT_A2 * (jnp.sin(EIGHT_W2 * t) * exp_term) + center[..., 0]
    vd0 = EIGHT_A2 * ((EIGHT_W2 * jnp.cos(EIGHT_W2 * t)) * exp_term
                      + jnp.sin(EIGHT_W2 * t) * d_exp)
    xd1 = EIGHT_A1 * (jnp.cos(EIGHT_W1 * t) - 1.0) * exp_term + center[..., 1]
    vd1 = EIGHT_A1 * ((EIGHT_W1 * -jnp.sin(EIGHT_W1 * t)) * exp_term
                      + (jnp.cos(EIGHT_W1 * t) - 1.0) * d_exp)
    # synchronized altitude (:485-489)
    z_amp = (center[..., 2] - EIGHT_ALT_D) / 2.0
    xd2 = z_amp * (1.0 - jnp.cos(EIGHT_W1 * t)) + center[..., 2]
    vd2 = z_amp * EIGHT_W1 * jnp.sin(EIGHT_W1 * t)
    # yaw (:492-495)
    phase = w_b1d * t * exp_term + ts.theta_init
    d_phase = w_b1d * (exp_term + t * d_exp)
    b1d_e = jnp.stack([jnp.cos(phase), jnp.sin(phase), jnp.zeros_like(phase)],
                      axis=-1)
    b1d_dot_e = jnp.stack(
        [-jnp.sin(phase) * d_phase, jnp.cos(phase) * d_phase,
         jnp.zeros_like(phase)], axis=-1)

    a = active
    a3 = active[..., None]
    new_xd = jnp.stack([xd0, xd1, xd2], axis=-1)
    new_vd = jnp.stack([vd0, vd1, vd2], axis=-1)
    return ts.replace(
        started=jnp.ones_like(st), center=center, t_traj=t_traj,
        w_b1d=w_b1d, t=t,
        xd=jnp.where(a3, new_xd, xd), vd=jnp.where(a3, new_vd, vd),
        b1d=jnp.where(a3, b1d_e, b1d),
        b1d_dot=jnp.where(a3, b1d_dot_e, ts.b1d_dot),
        complete=ts.complete | ~a, manual_mode=ts.manual_mode | ~a,
    )


def _mode_manual(ts: TrajState, x, v, R) -> TrajState:
    """Manual-mode hold (trajectory_generator.py:232-249): zero velocity,
    heading frozen at theta_init (+offset, always 0 here)."""
    init = ts.manual_init
    cur = _set_to_current(ts, x, v, R)
    b1 = R[..., :, 0]
    theta0 = jnp.arctan2(b1[..., 1], b1[..., 0])
    theta_init = jnp.where(init, ts.theta_init, theta0)
    xd = jnp.where(init[..., None], ts.xd, cur.xd)
    theta = theta_init
    b1d = jnp.stack([jnp.cos(theta), jnp.sin(theta), jnp.zeros_like(theta)],
                    axis=-1)
    return ts.replace(
        manual_init=jnp.ones_like(init), theta_init=theta_init,
        xd=xd, vd=jnp.zeros_like(ts.vd), b1d=b1d,
    )


_MODES = [_mode_idle, _mode_hover, _mode_takeoff, _mode_land, _mode_stay,
          _mode_circle, _mode_eight]


def get_desired(ts: TrajState, x, v, R, W, mode) -> Tuple[TrajState, Goal]:
    """get_desired equivalent (trajectory_generator.py:113-173): handle mode
    changes, run the active mode branch (or manual hold), then compute Wd
    from the heading kinematics.

    Fast path: when ``mode`` is a static Python int (the training loop's
    fixed train_traj_mode), the single branch compiles directly — no
    lax.switch over all seven modes, no mode-change bookkeeping (episode
    restarts go through mark_traj_start), and the manual-hold overlay is
    dropped for modes that can never complete (0 and 1)."""
    if isinstance(mode, int):
        branch = min(max(mode, 0), len(_MODES) - 1)
        ts = ts.replace(mode=jnp.full_like(ts.mode, mode))
        if mode >= 2:
            use_man = ts.manual_mode
            auto = _MODES[branch](ts, x, v, R)
            man = _mode_manual(ts, x, v, R)
            ts = jax.tree.map(
                lambda a, b: jnp.where(
                    use_man.reshape(
                        use_man.shape + (1,) * (a.ndim - use_man.ndim)),
                    b, a),
                auto, man,
            )
            return _with_wd(ts, R, W, freeze=use_man)
        ts = _MODES[branch](ts, x, v, R)
        return _with_wd(ts, R, W)

    mode = jnp.asarray(mode, jnp.int32)
    changed = mode != ts.mode
    restarted = mark_traj_start(ts, x, R)
    ts = jax.tree.map(
        lambda a, b: jnp.where(
            changed.reshape(changed.shape + (1,) * (a.ndim - changed.ndim)),
            b, a),
        ts, restarted,
    )
    ts = ts.replace(mode=mode)

    branch = jnp.clip(mode, 0, len(_MODES) - 1)
    use_man = ts.manual_mode
    auto = jax.lax.switch(branch, _MODES, ts, x, v, R)
    man = _mode_manual(ts, x, v, R)
    ts = jax.tree.map(
        lambda a, b: jnp.where(
            use_man.reshape(use_man.shape + (1,) * (a.ndim - use_man.ndim)),
            b, a),
        auto, man,
    )
    return _with_wd(ts, R, W, freeze=use_man)


def _with_wd(ts: TrajState, R, W, freeze=None) -> Tuple[TrajState, Goal]:
    # Wd from b1c kinematics (trajectory_generator.py:164-172).  When the
    # machine was already in manual mode at entry, the reference's
    # calculate_desired early-returns BEFORE this block
    # (trajectory_generator.py:136-139), freezing Wd at its last value —
    # mirrored here via the ``freeze`` mask.
    b3 = R[..., :, 2]
    b3_dot = mm3(R, so3.hat(W))[..., :, 2]
    b1d, b1d_dot = ts.b1d, ts.b1d_dot
    b1c = b1d - dot3(b1d, b3)[..., None] * b3
    b1c_dot = b1d_dot - (
        dot3(b1d_dot, b3)[..., None] * b3
        + dot3(b1d, b3_dot)[..., None] * b3
        + dot3(b1d, b3)[..., None] * b3_dot
    )
    omega_c = so3.cross(b1c, b1c_dot)
    omega_c3 = dot3(b3, omega_c)
    Wd = jnp.zeros_like(ts.Wd).at[..., 2].set(omega_c3)
    if freeze is not None:
        Wd = jnp.where(freeze[..., None], ts.Wd, Wd)
    ts = ts.replace(Wd=Wd)
    goal = Goal(xd=ts.xd, vd=ts.vd, b1d=ts.b1d, b1d_dot=ts.b1d_dot, Wd=Wd)
    return ts, goal
