"""Golden tests of auxiliary subsystems against the actual reference:
trajectory generator modes vs the reference TrajectoryGenerator, and the
analysis tool against the reference's shipped flight log."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.envs import trajectory as traj

REF_PATH = "/root/reference"
HAS_REF = os.path.isdir(REF_PATH)
REF_DAT = os.path.join(REF_PATH, "results", "MODUL_log_20250303_120200.dat")


@pytest.fixture()
def ref_gen(monkeypatch):
    if not HAS_REF:
        pytest.skip("reference not available")
    monkeypatch.syspath_prepend(REF_PATH)
    monkeypatch.setattr(sys, "argv", ["main.py"])
    for m in list(sys.modules):
        if m.startswith(("gym_rotor", "args_parse", "utils.")) or m == "utils":
            sys.modules.pop(m)
    import importlib

    tg_mod = importlib.import_module("utils.trajectory_generator")

    class DummyEnv:
        dt = 1.0 / 200.0
        x_lim, v_lim, W_lim = 1.0, 4.0, 2 * np.pi
        eIx_lim = eIb1_lim = 3.0

    yield tg_mod.TrajectoryGenerator(DummyEnv())
    for m in list(sys.modules):
        if m.startswith(("gym_rotor", "args_parse", "utils.")) or m == "utils":
            sys.modules.pop(m)


def _state18(x, yaw=0.0):
    s = np.zeros(18)
    s[0:3] = x
    R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                  [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
    s[6:15] = R.reshape(9, order="F")
    return s, R


@pytest.mark.parametrize("mode", [2, 5, 6])
def test_trajectory_matches_reference_deterministic_modes(ref_gen, mode):
    """Modes 2 (takeoff), 5 (circle), 6 (eight) are deterministic given the
    start state — outputs must match the reference machine step by step."""
    x0 = np.array([0.2, -0.1, -0.05])
    s18, R = _state18(x0, yaw=0.4)
    ref_gen.mark_traj_start(s18)

    ts = traj.TrajState.create(jax.random.PRNGKey(0), jnp.float64)
    ts = traj.mark_traj_start(ts, jnp.asarray(x0), jnp.asarray(R))

    xj = jnp.asarray(x0)
    vj = jnp.zeros(3, jnp.float64)
    Rj = jnp.asarray(R)
    Wj = jnp.zeros(3, jnp.float64)
    step = jax.jit(lambda t: traj.get_desired(t, xj, vj, Rj, Wj, mode))

    n = 600 if mode == 2 else 1500
    for i in range(n):
        xd_r, vd_r, b1d_r, b1d_dot_r, Wd_r = ref_gen.get_desired(s18, mode)
        ts, g = step(ts)
        np.testing.assert_allclose(np.asarray(g.xd), xd_r, atol=1e-9,
                                   err_msg=f"xd mode {mode} step {i}")
        np.testing.assert_allclose(np.asarray(g.vd), vd_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.b1d), b1d_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.Wd), Wd_r, atol=1e-9)
        if ref_gen.trajectory_complete:
            break


def test_trajectory_hover_matches_reference_with_injected_randoms(ref_gen):
    """Mode 1 draws t_traj and w_b1d randomly; inject the reference's drawn
    values into our state and compare the deterministic remainder."""
    x0 = np.array([0.3, 0.2, -0.4])
    s18, R = _state18(x0, yaw=-0.7)
    ref_gen.mark_traj_start(s18)

    ts = traj.TrajState.create(jax.random.PRNGKey(0), jnp.float64)
    ts = traj.mark_traj_start(ts, jnp.asarray(x0), jnp.asarray(R))

    xj, Rj = jnp.asarray(x0), jnp.asarray(R)
    vj = jnp.zeros(3, jnp.float64)
    Wj = jnp.zeros(3, jnp.float64)

    # first reference call performs the random init
    xd_r, vd_r, b1d_r, _, Wd_r = ref_gen.get_desired(s18, 1)
    # inject reference randomness, replay our first step
    ts, g = traj.get_desired(ts, xj, vj, Rj, Wj, 1)
    ts = ts.replace(
        t_traj=jnp.asarray(float(ref_gen.t_traj)),
        smooth_term=jnp.asarray(float(ref_gen.smooth_term)),
        w_b1d=jnp.asarray(float(ref_gen.w_b1d)),
    )
    step = jax.jit(lambda t: traj.get_desired(t, xj, vj, Rj, Wj, 1))
    # recompute our outputs from the injected params going forward
    for i in range(500):
        xd_r, vd_r, b1d_r, b1d_dot_r, Wd_r = ref_gen.get_desired(s18, 1)
        ts, g = step(ts)
        np.testing.assert_allclose(np.asarray(g.xd), xd_r, atol=1e-9,
                                   err_msg=f"hover xd step {i}")
        np.testing.assert_allclose(np.asarray(g.vd), vd_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.b1d), b1d_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.b1d_dot), b1d_dot_r,
                                   atol=1e-9)


def _pack18(x, R):
    s = np.zeros(18)
    s[0:3] = x
    s[6:15] = R.reshape(9, order="F")
    return s


def test_trajectory_land_matches_reference(ref_gen):
    """Mode 3 (landing): deterministic constant-velocity descent to the
    motor-cutoff height (trajectory_generator.py:321-348), including the
    post-completion hold behavior."""
    x0 = np.array([0.15, -0.3, -0.55])
    s18, R = _state18(x0, yaw=0.9)
    ref_gen.mark_traj_start(s18)

    ts = traj.TrajState.create(jax.random.PRNGKey(0), jnp.float64)
    ts = traj.mark_traj_start(ts, jnp.asarray(x0), jnp.asarray(R))
    vj, Wj = jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64)
    Rj = jnp.asarray(R)
    step = jax.jit(lambda t, xx: traj.get_desired(t, xx, vj, Rj, Wj, 3))

    x = np.array(x0)
    for i in range(160):
        xd_r, vd_r, b1d_r, _, Wd_r = ref_gen.get_desired(_pack18(x, R), 3)
        ts, g = step(ts, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(g.xd), xd_r, atol=1e-9,
                                   err_msg=f"land xd step {i}")
        np.testing.assert_allclose(np.asarray(g.vd), vd_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.b1d), b1d_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.Wd), Wd_r, atol=1e-9)
        # descend with the command (slight overshoot so x[2] strictly
        # passes the cutoff and the is_landed branch fires, :335-344)
        x[2] = xd_r[2] + 1e-3
    assert ref_gen.is_landed and bool(ts.is_landed)


def test_trajectory_stay_then_manual_hold_matches_reference(ref_gen):
    """Mode 4 (stay) completes immediately and switches to the manual hold
    (trajectory_generator.py:351-356 -> 232-249): xd frozen at the
    manual-init pose, vd = 0, heading frozen — even as the state drifts."""
    x0 = np.array([0.4, 0.1, -0.6])
    s18, R = _state18(x0, yaw=-1.2)
    ref_gen.mark_traj_start(s18)

    ts = traj.TrajState.create(jax.random.PRNGKey(0), jnp.float64)
    ts = traj.mark_traj_start(ts, jnp.asarray(x0), jnp.asarray(R))
    vj, Wj = jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64)
    Rj = jnp.asarray(R)
    step = jax.jit(lambda t, xx: traj.get_desired(t, xx, vj, Rj, Wj, 4))

    for i in range(50):
        # drift the vehicle: the hold must NOT track it
        x = x0 + np.array([0.002 * i, -0.001 * i, 0.0005 * i])
        xd_r, vd_r, b1d_r, _, Wd_r = ref_gen.get_desired(_pack18(x, R), 4)
        ts, g = step(ts, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(g.xd), xd_r, atol=1e-9,
                                   err_msg=f"stay xd step {i}")
        np.testing.assert_allclose(np.asarray(g.vd), vd_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.b1d), b1d_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.Wd), Wd_r, atol=1e-9)
    assert ref_gen.manual_mode and bool(ts.manual_mode)


def test_trajectory_takeoff_to_manual_transition_matches_reference(ref_gen):
    """Mode 2 tracked to completion must hand off to the manual hold
    (mark_traj_end(True), trajectory_generator.py:298-309) and keep matching
    through the transition."""
    x0 = np.array([0.1, -0.2, 0.0])
    s18, R = _state18(x0, yaw=0.3)
    ref_gen.mark_traj_start(s18)

    ts = traj.TrajState.create(jax.random.PRNGKey(0), jnp.float64)
    ts = traj.mark_traj_start(ts, jnp.asarray(x0), jnp.asarray(R))
    vj, Wj = jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64)
    Rj = jnp.asarray(R)
    step = jax.jit(lambda t, xx: traj.get_desired(t, xx, vj, Rj, Wj, 2))

    x = np.array(x0)
    transitioned_at = None
    for i in range(2200):
        xd_r, vd_r, b1d_r, _, Wd_r = ref_gen.get_desired(_pack18(x, R), 2)
        ts, g = step(ts, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(g.xd), xd_r, atol=1e-9,
                                   err_msg=f"takeoff->manual xd step {i}")
        np.testing.assert_allclose(np.asarray(g.vd), vd_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.b1d), b1d_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.Wd), Wd_r, atol=1e-9)
        x = np.array(xd_r)  # track the command so the waypoint is reached
        if transitioned_at is None and ref_gen.manual_mode:
            transitioned_at = i
        if transitioned_at is not None and i > transitioned_at + 100:
            break
    assert transitioned_at is not None, "takeoff never completed"
    assert bool(ts.manual_mode)


def test_trajectory_idle_matches_reference_with_injected_heading(ref_gen):
    """Mode 0 (idle/warm-up) draws one random heading offset in +-25 deg
    (trajectory_generator.py:141-148); inject the reference's drawn b1d and
    compare the deterministic remainder (zero goal + frozen heading + Wd)."""
    x0 = np.array([0.25, 0.15, -0.35])
    s18, R = _state18(x0, yaw=0.6)
    ref_gen.mark_traj_start(s18)

    ts = traj.TrajState.create(jax.random.PRNGKey(0), jnp.float64)
    ts = traj.mark_traj_start(ts, jnp.asarray(x0), jnp.asarray(R))
    vj = jnp.zeros(3, jnp.float64)
    Wj = jnp.asarray([0.05, -0.03, 0.2])  # nonzero so Wd is nontrivial
    Rj = jnp.asarray(R)

    # first reference call performs the heading draw
    xd_r, vd_r, b1d_r, _, Wd_r = ref_gen.get_desired(s18, 0)
    # inject: run our first step (performs our own draw), then overwrite
    ts, _ = traj.get_desired(ts, jnp.asarray(x0), vj, Rj, Wj, 0)
    ts = ts.replace(b1d=jnp.asarray(b1d_r))
    step = jax.jit(lambda t: traj.get_desired(t, jnp.asarray(x0), vj, Rj,
                                              Wj, 0))
    for i in range(100):
        xd_r, vd_r, b1d_r, _, Wd_r = ref_gen.get_desired(s18, 0)
        ts, g = step(ts)
        np.testing.assert_allclose(np.asarray(g.xd), xd_r, atol=1e-9,
                                   err_msg=f"idle xd step {i}")
        np.testing.assert_allclose(np.asarray(g.vd), vd_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.b1d), b1d_r, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.Wd), Wd_r, atol=1e-9)


@pytest.mark.skipif(not os.path.exists(REF_DAT),
                    reason="reference flight log not present")
def test_analysis_parses_reference_flight_log():
    """Our draw_plot must ingest the reference's real .dat artifact."""
    from gym_rotor_tpu.analysis import draw_plot

    log = draw_plot.parse_log(REF_DAT, "MODUL")
    T = log.state.shape[0]
    assert T > 500
    # rotation columns really are rotations
    for t in range(0, T, 200):
        R = log.state[t, 6:15].reshape(3, 3, order="F")
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
    log = draw_plot.reconstruct_wrench(log)
    # total thrust stays within the actuator envelope
    from gym_rotor_tpu.envs.oracle import OracleParams
    p = OracleParams.nominal()
    assert (log.f_total >= 4 * p.min_force - 1e-9).all()
    assert (log.f_total <= 4 * p.max_force + 1e-9).all()
    rep = draw_plot.rmse_report(log)
    assert all(np.isfinite(v) for v in rep.values())
    # a trained-policy hover/tracking flight: position RMSE well under 50 cm
    assert rep["rmse_ex_cm"] < 50.0
