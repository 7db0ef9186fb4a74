"""Trajectory-generator tests: behavior vs a NumPy transcription of the
reference state machine (utils/trajectory_generator.py) and mode properties."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.envs import trajectory as traj
from gym_rotor_tpu.ops import so3


def fresh(key=0, x=None, R=None):
    ts = traj.TrajState.create(jax.random.PRNGKey(key), jnp.float64)
    x = jnp.zeros(3, jnp.float64) if x is None else jnp.asarray(x, jnp.float64)
    R = jnp.eye(3, dtype=jnp.float64) if R is None else jnp.asarray(R, jnp.float64)
    return traj.mark_traj_start(ts, x, R)


def run_mode(mode, n, x=None, v=None, R=None, W=None, key=0):
    ts = fresh(key, x, R)
    x = jnp.zeros(3, jnp.float64) if x is None else jnp.asarray(x, jnp.float64)
    v = jnp.zeros(3, jnp.float64) if v is None else jnp.asarray(v, jnp.float64)
    R = jnp.eye(3, dtype=jnp.float64) if R is None else jnp.asarray(R, jnp.float64)
    W = jnp.zeros(3, jnp.float64) if W is None else jnp.asarray(W, jnp.float64)
    goals = []
    step = jax.jit(lambda t: traj.get_desired(t, x, v, R, W, mode))
    for _ in range(n):
        ts, g = step(ts)
        goals.append(jax.tree.map(np.asarray, g))
    return ts, goals


def test_mode0_idle_random_heading():
    """Mode 0 (trajectory_generator.py:141-148): zero goal, b1d rotated from
    the current heading by <= 25 deg, then frozen."""
    R = so3.rot_z(jnp.asarray(0.7, jnp.float64))
    ts, goals = run_mode(0, 5, R=R)
    g0 = goals[0]
    np.testing.assert_array_equal(g0.xd, 0.0)
    np.testing.assert_array_equal(g0.vd, 0.0)
    ang = np.arctan2(g0.b1d[1], g0.b1d[0])
    assert abs(ang - 0.7) <= 25.0 * np.pi / 180.0 + 1e-9
    for g in goals[1:]:
        np.testing.assert_array_equal(g.b1d, g0.b1d)  # frozen after init


def test_mode1_hover_settles_to_origin():
    """Mode 1 (trajectory_generator.py:252-277): xd decays exponentially from
    the start position to the origin; yaw rotates at constant w."""
    x0 = np.array([0.4, -0.3, 0.2])
    ts, goals = run_mode(1, 3000, x=x0)
    # early: close to x0; late: close to 0 (t_traj <= 5s, smooth kills 99.9%)
    np.testing.assert_allclose(goals[0].xd, x0, atol=2e-2)
    np.testing.assert_allclose(goals[-1].xd, 0.0, atol=1e-3)
    # b1d stays unit-norm and rotates at fixed rate
    w = float(ts.w_b1d)
    assert abs(w) <= 0.15 * np.pi
    for g in goals:
        assert abs(np.linalg.norm(g.b1d) - 1.0) < 1e-12


def test_mode1_hover_matches_closed_form():
    """xd(t) must equal x0 * exp(-smooth*t) elementwise (x_goal = 0)."""
    x0 = np.array([0.5, 0.1, -0.2])
    ts, goals = run_mode(1, 100, x=x0)
    smooth = float(ts.smooth_term)
    for i, g in enumerate(goals):
        t = (i + 1) * traj.DT
        np.testing.assert_allclose(g.xd, x0 * np.exp(-smooth * t), rtol=1e-12)
        np.testing.assert_allclose(
            g.vd, -x0 * smooth * np.exp(-smooth * t), rtol=1e-12)


def test_mode2_takeoff_climbs_to_height():
    ts, goals = run_mode(2, 100, x=np.array([0.1, 0.2, 0.0]))
    # climbs at TAKEOFF_VELOCITY from z=0 toward -0.5
    z = [g.xd[2] for g in goals]
    np.testing.assert_allclose(
        z[9], traj.TAKEOFF_VELOCITY * 10 * traj.DT, rtol=1e-9)
    assert z[-1] >= traj.TAKEOFF_END_HEIGHT - 1e-9
    # horizontal target frozen at start position
    np.testing.assert_allclose(goals[-1].xd[0:2], [0.1, 0.2], rtol=1e-12)


def test_mode5_circle_geometry():
    x0 = np.array([0.0, 0.0, -0.3])
    ts, goals = run_mode(5, 2000, x=x0)
    # after lead-in (r/v = 1.75 s = 350 steps), xd lies on the circle
    for i in range(400, 1999, 100):
        g = goals[i]
        rad = np.linalg.norm(g.xd[0:2] - x0[0:2])
        np.testing.assert_allclose(rad, traj.CIRCLE_RADIUS, rtol=1e-9)
        # z frozen at start altitude
        np.testing.assert_allclose(g.xd[2], x0[2], rtol=1e-12)
        assert abs(np.linalg.norm(g.b1d) - 1.0) < 1e-9


def test_mode6_eight_shape_bounds():
    x0 = np.zeros(3)
    ts, goals = run_mode(6, int(traj.NUM_EIGHTS * traj.EIGHT_T / traj.DT) - 10,
                         x=x0)
    xs = np.array([g.xd for g in goals])
    assert np.abs(xs[:, 0]).max() <= traj.EIGHT_A2 + 1e-6
    assert xs[:, 1].min() >= -2 * traj.EIGHT_A1 - 1e-6 and xs[:, 1].max() <= 1e-6
    # altitude oscillates between start (0) and EIGHT_ALT_D
    assert xs[:, 2].min() >= traj.EIGHT_ALT_D - 1e-6
    # vd is the numerical derivative of xd
    num_v = np.gradient(xs[:, 0], traj.DT)
    np.testing.assert_allclose(num_v[50:-50], [g.vd[0] for g in goals][50:-50],
                               atol=2e-2)


def test_wd_kinematics_consistency():
    """Wd = [0, 0, b3 . (b1c x b1c_dot)] (trajectory_generator.py:164-172);
    for a level attitude and planar rotating b1d at rate w, Wd3 ~= w."""
    ts = fresh(0)
    x = jnp.zeros(3, jnp.float64)
    v = jnp.zeros(3, jnp.float64)
    R = jnp.eye(3, dtype=jnp.float64)
    W = jnp.zeros(3, jnp.float64)
    for _ in range(10):
        ts, g = traj.get_desired(ts, x, v, R, W, 1)
    w = float(ts.w_b1d)
    np.testing.assert_allclose(float(g.Wd[2]), w, rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(g.Wd[0:2]), 0.0)


def test_mode_change_restarts():
    ts = fresh(0)
    x = jnp.array([0.3, 0.0, 0.0], jnp.float64)
    v = jnp.zeros(3, jnp.float64)
    R = jnp.eye(3, dtype=jnp.float64)
    W = jnp.zeros(3, jnp.float64)
    for _ in range(50):
        ts, g = traj.get_desired(ts, x, v, R, W, jnp.asarray(1))
    t_before = float(ts.t)
    assert t_before > 0.2
    ts, g = traj.get_desired(ts, x, v, R, W, jnp.asarray(5))  # switch hover -> circle (dynamic-mode path)
    assert float(ts.t) == pytest.approx(traj.DT)  # restarted
    assert int(ts.mode) == 5


def test_vmapped_modes():
    """All modes must run batched with per-env mode selection."""
    n = 7
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    ts = jax.vmap(lambda k: traj.TrajState.create(k, jnp.float64))(keys)
    x = jnp.zeros((n, 3), jnp.float64)
    v = jnp.zeros((n, 3), jnp.float64)
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (n, 3, 3))
    W = jnp.zeros((n, 3), jnp.float64)
    ts = jax.vmap(traj.mark_traj_start)(ts, x, R)
    modes = jnp.arange(n, dtype=jnp.int32)
    step = jax.jit(jax.vmap(traj.get_desired))
    for _ in range(20):
        ts, g = step(ts, x, v, R, W, modes)
    assert g.xd.shape == (n, 3)
    assert np.isfinite(np.asarray(g.xd)).all()
    assert np.isfinite(np.asarray(g.Wd)).all()
