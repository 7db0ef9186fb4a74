"""Functional quadrotor environment core.

One pure ``step`` function implements all three tasks of the reference:

* ``QUAD``      — base Quad-v0 per-motor-thrust env (reference
  gym_rotor/envs/quad.py:142-335).  The reference's base ``step`` is broken
  standalone (indexes scalar rewards, quad.py:155-165); here it is the fixed,
  runnable version of the same math.
* ``COUPLED``   — MONO task (reference gym_rotor/wrappers/coupled_yaw_wrapper.py).
* ``DECOUPLED`` — MODUL two-agent task (reference
  gym_rotor/wrappers/decoupled_yaw_wrapper.py), including the virtual-moment
  assembly M1 = b1ᵀτ + J3 W3 W2, M2 = b2ᵀτ − J3 W3 W1 (decoupled:68-73).

The task and all coefficients live in the static ``Config``, so the selected
branch compiles to straight-line code: no Python dispatch, no subclassing.
Arithmetic on the state path uses the fixed-association helpers from
``dynamics`` so the float64 Euler configuration is bit-identical to the NumPy
oracle (see ``oracle.py``) — the parity strategy of SURVEY.md §4/§7.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

from ..ops import so3
from ..utils.config import Config
from . import params as params_lib
from .dynamics import dot3, integrate
from .params import QuadParams
from .state import EnvState, Goal, pack_state

# State limits (reference quad.py:104-107) and integral limits
# (coupled_yaw_wrapper.py:23-25).
X_LIM = 1.0
V_LIM = 4.0
W_LIM = 2.0 * jnp.pi
EULER_LIM_DEG = 85.0
EIX_LIM = 3.0
EIB1_LIM = 3.0
SAT_SIGMA = 1.0
FREQ = 200
DT = 1.0 / FREQ            # (quad.py:60-61)


class StepOut(NamedTuple):
    obs: Union[jnp.ndarray, Tuple[jnp.ndarray, ...]]
    reward: jnp.ndarray     # (n_agents,)
    done: jnp.ndarray       # (n_agents,) bool
    info: dict


def _ensure_R(cfg: Config, R):
    """Re-orthonormalize R on *read*, exactly like the reference
    (quad_utils.py:12-16) — only needed on the exact/parity path.  The fast
    path maintains the invariant that the stored R is already orthonormal
    (one polar repair per step, applied post-integration), so reads are
    passthrough."""
    if cfg.exact_so3:
        return so3.ensure_so3_exact(R)
    return R


# ----------------------------------------------------------------------------
# Action wrappers
# ----------------------------------------------------------------------------
def action_quad(p: QuadParams, a):
    """Per-motor thrusts -> (f, M) (reference quad.py:225-242)."""
    forces = jnp.clip(
        p.scale_act[..., None] * a + p.avrg_act[..., None],
        p.min_force[..., None], p.max_force[..., None],
    )
    # fixed-order 4x4 matvec (parity with the oracle; stays off the MXU)
    F = p.forces_to_fM
    fM = (
        (F[..., :, 0] * forces[..., 0:1] + F[..., :, 1] * forces[..., 1:2])
        + (F[..., :, 2] * forces[..., 2:3] + F[..., :, 3] * forces[..., 3:4])
    )
    return fM[..., 0], fM[..., 1:4], forces


def _f_total(p: QuadParams, a0):
    """Total-thrust channel shared by both wrappers (coupled:44-53)."""
    return jnp.clip(
        4.0 * (p.scale_act * a0 + p.avrg_act),
        4.0 * p.min_force, 4.0 * p.max_force,
    )


def action_coupled(p: QuadParams, a):
    """MONO: a = (f_total, M1, M2, M3) (coupled_yaw_wrapper.py:44-53)."""
    return _f_total(p, a[..., 0]), a[..., 1:4]


def action_decoupled(p: QuadParams, a):
    """MODUL: a = (f_total, tau1..3, M3) (decoupled_yaw_wrapper.py:49-59)."""
    return _f_total(p, a[..., 0]), a[..., 1:4], a[..., 4]


# ----------------------------------------------------------------------------
# Normalized error observation (reference quad.py:421-466)
# ----------------------------------------------------------------------------
class NormErr(NamedTuple):
    ex: jnp.ndarray       # normalized position error (3,)
    eIx: jnp.ndarray      # saturated normalized position integral (3,)
    ev: jnp.ndarray
    eW: jnp.ndarray
    eW3: jnp.ndarray      # scalar
    eb1: jnp.ndarray      # scalar, in [-1, 1)
    eIb1: jnp.ndarray     # scalar
    R: jnp.ndarray        # re-orthonormalized rotation
    # updated integral states:
    eIx_err: jnp.ndarray
    eIx_integrand: jnp.ndarray
    eIb1_err: jnp.ndarray
    eIb1_integrand: jnp.ndarray


def norm_error_state(cfg: Config, x, v, R, W, goal: Goal,
                     eIx_err, eIx_int, eIb1_err, eIb1_int) -> NormErr:
    """Normalized error terms + leaky trapezoidal integral update
    (quad.py:421-466, quad_utils.py:38-63)."""
    dtype = x.dtype
    R = _ensure_R(cfg, R)
    x_norm = x / X_LIM
    v_norm = v / V_LIM
    W_norm = W / W_LIM
    xd_norm = goal.xd / X_LIM
    vd_norm = goal.vd / V_LIM
    Wd_norm = goal.Wd / W_LIM

    ex = x_norm - xd_norm
    ev = v_norm - vd_norm
    eW = W_norm - Wd_norm
    eW3 = W_norm[..., 2] - Wd_norm[..., 2]

    b1 = R[..., :, 0]
    b2 = R[..., :, 1]
    b3 = R[..., :, 2]
    # b1c = b1d - (b1d·b3) b3 ; eb1 = atan2(-b1c·b2, b1c·b1) (quad.py:443-445)
    b1c = goal.b1d - dot3(goal.b1d, b3)[..., None] * b3
    eb1 = jnp.arctan2(-dot3(b1c, b2), dot3(b1c, b1))
    pi = jnp.asarray(jnp.pi, dtype)
    eb1_norm = eb1 / pi

    # Leaky trapezoid integrals (quad.py:447-451):
    #   eIx.integrate(-alpha*eIx.error + ex_norm*x_lim, dt)
    alpha = jnp.asarray(cfg.alpha, dtype)
    beta = jnp.asarray(cfg.beta, dtype)
    dt = jnp.asarray(DT, dtype)
    eIx_cur = -alpha * eIx_err + ex * X_LIM
    eIx_err = eIx_err + ((eIx_int + eIx_cur) * dt) / 2.0
    eIx_norm = jnp.clip(eIx_err / EIX_LIM, -SAT_SIGMA, SAT_SIGMA)
    eIb1_cur = -beta * eIb1_err + eb1_norm * pi
    eIb1_err = eIb1_err + ((eIb1_int + eIb1_cur) * dt) / 2.0
    eIb1_norm = jnp.clip(eIb1_err / EIB1_LIM, -SAT_SIGMA, SAT_SIGMA)

    return NormErr(
        ex=ex, eIx=eIx_norm, ev=ev, eW=eW, eW3=eW3, eb1=eb1_norm,
        eIb1=eIb1_norm, R=R,
        eIx_err=eIx_err, eIx_integrand=eIx_cur,
        eIb1_err=eIb1_err, eIb1_integrand=eIb1_cur,
    )


def build_obs(cfg: Config, ne: NormErr):
    """Assemble the per-framework observation (quad.py:453-464), cast to
    float32 exactly as the reference does (np.concatenate dtype=float32)."""
    if cfg.framework == "MODUL":
        b1 = ne.R[..., :, 0]
        b2 = ne.R[..., :, 1]
        b3 = ne.R[..., :, 2]
        ew12 = ne.eW[..., 0, None] * b1 + ne.eW[..., 1, None] * b2
        obs1 = jnp.concatenate([ne.ex, ne.eIx, ne.ev, b3, ew12], axis=-1)
        obs2 = jnp.stack([ne.eb1, ne.eIb1, ne.eW3], axis=-1)
        return obs1.astype(jnp.float32), obs2.astype(jnp.float32)
    # MONO: R flattened column-major (quad.py:462)
    R_vec = jnp.swapaxes(ne.R, -1, -2).reshape(ne.R.shape[:-2] + (9,))
    obs = jnp.concatenate(
        [ne.ex, ne.eIx, ne.ev, R_vec, ne.eb1[..., None],
         ne.eIb1[..., None], ne.eW], axis=-1,
    )
    return obs.astype(jnp.float32)


# ----------------------------------------------------------------------------
# Rewards / termination — computed from the float32 obs like the reference
# (wrappers decompose the float32 observation arrays).
# ----------------------------------------------------------------------------
def _sqnorm(x):
    """Mirror -C*(np.linalg.norm(v)**2): sqrt of ordered dot, then squared."""
    n = jnp.sqrt(dot3(x, x))
    return n * n


def _interp01(r, rmin):
    """np.interp(r, [rmin, 0], [0, 1]) — linear with endpoint clamping
    (quad.py:154-158)."""
    r = r.astype(jnp.float64) if jax.config.jax_enable_x64 else r
    slope = (1.0 - 0.0) / (0.0 - rmin)
    val = slope * (r - rmin) + 0.0
    return jnp.clip(val, 0.0, 1.0)


def reward_coupled(cfg: Config, obs):
    """MONO 6-term reward (coupled_yaw_wrapper.py:78-92)."""
    ex, eIx, ev = obs[..., 0:3], obs[..., 3:6], obs[..., 6:9]
    eb1, eIb1, eW = obs[..., 18], obs[..., 19], obs[..., 20:23]
    r = -cfg.Cx * _sqnorm(ex)
    r = r + -cfg.CIx * _sqnorm(eIx)
    r = r + -cfg.Cv * _sqnorm(ev)
    r = r + -cfg.Cb1 * jnp.abs(eb1)
    r = r + -cfg.CIb1 * (jnp.abs(eIb1) ** 2)
    r = r + -cfg.Cw12 * _sqnorm(eW)   # CW := args.Cw12 (quad.py:80)
    return r[..., None]


def reward_decoupled(cfg: Config, obs1, obs2):
    """MODUL per-agent rewards (decoupled_yaw_wrapper.py:92-113)."""
    ex, eIx, ev = obs1[..., 0:3], obs1[..., 3:6], obs1[..., 6:9]
    ew12 = obs1[..., 12:15]
    r1 = -cfg.Cx * _sqnorm(ex)
    r1 = r1 + -cfg.CIx * _sqnorm(eIx)
    r1 = r1 + -cfg.Cv * _sqnorm(ev)
    r1 = r1 + -cfg.Cw12 * _sqnorm(ew12)
    eb1, eIb1, eW3 = obs2[..., 0], obs2[..., 1], obs2[..., 2]
    r2 = -cfg.Cb1 * jnp.abs(eb1)
    r2 = r2 + -cfg.CIb1 * (jnp.abs(eIb1) ** 2)
    r2 = r2 + -cfg.CW3 * (jnp.abs(eW3) ** 2)
    return jnp.stack([r1, r2], axis=-1)


def reward_quad(cfg: Config, x, v, R, W, goal: Goal):
    """Base Quad-v0 reward on raw (unnormalized) errors (quad.py:274-298)."""
    eX = x - goal.xd
    eV = v - goal.vd
    # normalized signed heading angle in [-1, 1) (quad.py:287)
    eb1 = so3.norm_ang_btw_two_vectors(goal.b1d, so3.heading_b1(R))
    r = -cfg.Cx * _sqnorm(eX)
    r = r + -cfg.Cb1 * jnp.abs(eb1)
    r = r + -cfg.Cv * _sqnorm(eV)
    r = r + -cfg.Cw12 * _sqnorm(W)
    return r[..., None]


def done_coupled(obs):
    """MONO termination (coupled_yaw_wrapper.py:95-110)."""
    ex, ev, eW = obs[..., 0:3], obs[..., 6:9], obs[..., 20:23]
    d = (
        jnp.any(jnp.abs(ex) >= 1.0, axis=-1)
        | jnp.any(jnp.abs(ev) >= 1.0, axis=-1)
        | jnp.any(jnp.abs(eW) >= 1.0, axis=-1)
    )
    return d[..., None]


def done_decoupled(obs1, obs2):
    """MODUL per-agent termination (decoupled_yaw_wrapper.py:116-140)."""
    ex, ev, ew12 = obs1[..., 0:3], obs1[..., 6:9], obs1[..., 12:15]
    d1 = (
        jnp.any(jnp.abs(ex) >= 1.0, axis=-1)
        | jnp.any(jnp.abs(ev) >= 1.0, axis=-1)
        | jnp.any(jnp.abs(ew12) >= 1.0, axis=-1)
    )
    d2 = jnp.abs(obs2[..., 2]) >= 1.0
    return jnp.stack([d1, d2], axis=-1)


def done_quad(x, v, R, W):
    """Base Quad-v0 termination incl. Euler-angle tilt limit
    (quad.py:301-318)."""
    euler = so3.rot_to_euler(R) * (180.0 / jnp.pi)
    d = (
        jnp.any(jnp.abs(x) >= X_LIM, axis=-1)
        | jnp.any(jnp.abs(v) >= V_LIM, axis=-1)
        | jnp.any(jnp.abs(W) >= W_LIM, axis=-1)
        | (jnp.abs(euler[..., 0]) >= EULER_LIM_DEG)
        | (jnp.abs(euler[..., 1]) >= EULER_LIM_DEG)
    )
    return d[..., None]


# ----------------------------------------------------------------------------
# Step
# ----------------------------------------------------------------------------
def step(cfg: Config, state: EnvState, action, task: str = None) -> Tuple[EnvState, StepOut]:
    """One control tick: action scaling -> dynamics integration -> error obs
    -> reward -> termination (pipeline of reference quad.py:142-168; the
    'observation_wrapper integrates the ODE' naming inversion is undone).

    ``task`` defaults to the wrapper matching cfg.framework:
    MONO -> 'coupled', MODUL -> 'decoupled'; pass 'quad' for the base env.
    """
    if task is None:
        task = "decoupled" if cfg.framework == "MODUL" else "coupled"
    p = state.params
    dtype = state.x.dtype
    action = jnp.asarray(action, dtype)

    # -- 1. action wrapper + (for MODUL) virtual-moment assembly.
    R_work = _ensure_R(cfg, state.R)  # state_decomposition re-orthonormalizes
    W = state.W
    if task == "quad":
        f, M, _forces = action_quad(p, action)
    elif task == "coupled":
        f, M = action_coupled(p, action)
    elif task == "decoupled":
        f, tau, M3 = action_decoupled(p, action)
        b1 = R_work[..., :, 0]
        b2 = R_work[..., :, 1]
        J3 = p.J[..., 2]
        # decoupled_yaw_wrapper.py:68-73
        M1 = dot3(b1, tau) + J3 * W[..., 2] * W[..., 1]
        M2 = dot3(b2, tau) - J3 * W[..., 2] * W[..., 0]
        M = jnp.stack([M1, M2, M3], axis=-1)
    else:
        raise ValueError(f"unknown task {task!r}")

    # -- 2. integrate dynamics with the wrench held constant over dt.
    dt = jnp.asarray(DT, dtype)
    x_n, v_n, R_n, W_n = integrate(
        cfg.integrator, state.x, state.v, R_work, W, f, M, p, dt
    )
    if not cfg.exact_so3:
        # Fast path keeps the stored attitude orthonormal (single cheap polar
        # repair); the exact path stores the drifted matrix like the
        # reference and repairs on read.
        R_n = so3.polar_fast(R_n)

    # -- 3. normalized error observation + integral updates (the base env
    # never touches the integral state inside step — only the wrappers'
    # get_norm_error_state path does, quad.py:245-271 vs :421-466).
    if task != "quad":
        ne = norm_error_state(
            cfg, x_n, v_n, R_n, W_n, state.goal,
            state.eIx, state.eIx_integrand, state.eIb1, state.eIb1_integrand,
        )

    # -- 4/5. obs, reward, done per task.
    if task == "quad":
        R_read = _ensure_R(cfg, R_n)
        obs = pack_state(x_n, v_n, R_n, W_n)
        reward = reward_quad(cfg, x_n, v_n, R_read, W_n, state.goal)
        done = done_quad(x_n, v_n, R_read, W_n)
        reward = _interp01(reward, float(cfg.reward_min))
        reward = jnp.where(done, -1.0, reward).astype(dtype)
        new_state = state.replace(
            x=x_n, v=v_n, R=R_n, W=W_n, f_total=f, M=M, t=state.t + 1,
        )
        info = {"ex": x_n - state.goal.xd,
                "eb1": jnp.zeros(x_n.shape[:-1], dtype)}
        return new_state, StepOut(obs=obs, reward=reward, done=done,
                                 info=info)
    elif task == "coupled":
        obs = build_obs(cfg, ne)
        reward = reward_coupled(cfg, obs)
        done = done_coupled(obs)
        reward = _interp01(reward, float(cfg.reward_min))
    else:
        obs = build_obs(cfg, ne)
        obs1, obs2 = obs
        reward = reward_decoupled(cfg, obs1, obs2)
        done = done_decoupled(obs1, obs2)
        reward = jnp.stack(
            [
                _interp01(reward[..., 0], float(cfg.reward_min_1)),
                _interp01(reward[..., 1], float(cfg.reward_min_2)),
            ],
            axis=-1,
        )
    # Crash override (quad.py:160-166): reward := -1 on termination.
    reward = jnp.where(done, -1.0, reward).astype(dtype)

    new_state = state.replace(
        x=x_n, v=v_n, R=R_n, W=W_n,
        eIx=ne.eIx_err, eIx_integrand=ne.eIx_integrand,
        eIb1=ne.eIb1_err, eIb1_integrand=ne.eIb1_integrand,
        f_total=f, M=M, t=state.t + 1,
    )
    # De-normalized errors for driver-level logic (utils/utils.py:21-39).
    if task == "decoupled":
        info = {"ex": obs1[..., 0:3] * X_LIM, "eb1": obs2[..., 0] * jnp.pi}
    else:
        info = {"ex": obs[..., 0:3] * X_LIM, "eb1": obs[..., 18] * jnp.pi}
    return new_state, StepOut(obs=obs, reward=reward, done=done, info=info)


# ----------------------------------------------------------------------------
# Reset
# ----------------------------------------------------------------------------
def _init_ranges(cfg: Config, env_type: str, key):
    """Initial-error magnitudes (quad.py:338-356).  Returns per-draw ranges
    and the key consumed by the 20%-at-origin branch."""
    d2r = jnp.pi / 180.0
    if env_type == "eval":
        return (
            jnp.asarray(0.4), jnp.asarray(0.0), jnp.asarray(0.0),
            jnp.asarray(0.0), key,
        )
    key, sub = jax.random.split(key)
    at_origin = jax.random.uniform(sub, ()) < 0.2
    init_x = jnp.where(at_origin, 0.0, 0.6)
    init_v = jnp.where(at_origin, 0.0, V_LIM * 0.5)
    init_R = jnp.where(at_origin, 0.0, 50.0 * d2r)
    init_W = jnp.where(at_origin, 0.0, W_LIM * 0.5)
    return init_x, init_v, init_R, init_W, key


def reset_state(cfg: Config, key: jax.Array, env_type: str = "train",
                dtype=jnp.float32) -> EnvState:
    """Episode initialization (quad.py:171-222 + wrapper resets
    coupled:27-41 / decoupled:28-46): fresh state only, no observation and
    no integral update.  Callers assign the trajectory goal and then call
    ``initial_obs`` exactly once, replicating the reference driver order
    reset -> set_goal_state -> get_norm_error_state (main.py:126-129)."""
    k_param, k_branch, k_x, k_next = jax.random.split(key, 4)

    if cfg.use_UDM and env_type == "train":
        p = params_lib.randomize(k_param, cfg.UDM_percentage, dtype)
    else:
        p = params_lib.nominal(dtype)

    init_x, init_v, init_R, init_W, _ = _init_ranges(cfg, env_type, k_branch)
    init_x = init_x.astype(dtype)
    init_v = init_v.astype(dtype)
    init_R = init_R.astype(dtype)
    init_W = init_W.astype(dtype)

    # one fused uniform draw for all 12 initial-state values
    u = jax.random.uniform(k_x, (12,), dtype, -1.0, 1.0)
    x = u[0:3] * init_x
    v = u[3:6] * init_v
    W = u[6:9] * init_W
    roll_pitch = u[9:11] * init_R
    yaw = u[11:12] * jnp.pi
    euler = jnp.concatenate([roll_pitch, yaw])
    R = so3.euler_to_rot(euler)  # orthonormal by construction
    if cfg.exact_so3:
        R = so3.ensure_so3_exact(R)

    return fresh_state(p, x, v, R, W, k_next, dtype)


def fresh_state(p: QuadParams, x, v, R, W, key, dtype=jnp.float32) -> EnvState:
    """Post-reset EnvState for a given pose: zero integrals, hover wrench,
    default goal (quad.py:206-216 + wrapper zeroing coupled:27-41).  Shared
    by the randomized reset above and the reference eval-stream replay
    (envs/ref_stream.py) so their initialization semantics cannot drift."""
    z3 = jnp.zeros(3, dtype)
    return EnvState(
        x=x, v=v, R=R, W=W,
        eIx=z3, eIx_integrand=z3,
        eIb1=jnp.zeros((), dtype), eIb1_integrand=jnp.zeros((), dtype),
        f_total=p.m * params_lib.G_STD, M=z3,
        goal=Goal.default(dtype),
        params=p,
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def reset(cfg: Config, key: jax.Array, env_type: str = "train",
          dtype=jnp.float32) -> Tuple[EnvState, StepOut]:
    """Convenience single-env reset: state + first observation against the
    default goal (one integral update, like a driver that never calls
    set_goal_state)."""
    return initial_obs(cfg, reset_state(cfg, key, env_type, dtype))


def initial_obs(cfg: Config, state: EnvState):
    """First observation after reset: one get_norm_error_state call
    (main.py:129) including its integral update.  Returns (state, obs)."""
    ne = norm_error_state(
        cfg, state.x, state.v, state.R, state.W, state.goal,
        state.eIx, state.eIx_integrand, state.eIb1, state.eIb1_integrand,
    )
    obs = build_obs(cfg, ne)
    state = state.replace(
        eIx=ne.eIx_err, eIx_integrand=ne.eIx_integrand,
        eIb1=ne.eIb1_err, eIb1_integrand=ne.eIb1_integrand,
    )
    return state, obs


def set_goal(state: EnvState, xd, vd, b1d, b1d_dot, Wd) -> EnvState:
    """set_goal_state equivalent (quad.py:413-418)."""
    return state.replace(goal=Goal(xd=xd, vd=vd, b1d=b1d, b1d_dot=b1d_dot, Wd=Wd))
