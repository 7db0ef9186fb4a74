"""Fixed-seed parity tests (BASELINE.md correctness target).

Three layers of evidence, per SURVEY.md §4/§7:

1. **JAX ↔ oracle, bitwise**: the float64 Euler configuration of the JAX env
   must reproduce the NumPy oracle bit-for-bit over full trajectories
   (identical fixed-order arithmetic on both sides).
2. **oracle ↔ reference, tight tolerance**: the oracle replays the actual
   reference code's trajectories (imported from /root/reference when
   available) to ~1e-12 — the residual being BLAS summation-order slack.
3. **DOP853 behavioral equivalence**: the fixed-step DOP853 path matches
   scipy's adaptive solve_ivp to integration tolerance.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.envs import oracle as onp
from gym_rotor_tpu.envs import quad, state_from_oracle
from gym_rotor_tpu.utils.config import Config

REF_PATH = "/root/reference"
HAS_REF = os.path.isdir(REF_PATH)


def make_cfg(framework):
    return Config(framework=framework, integrator="euler", exact_so3=True,
                  use_UDM=True)


def hover_actions(task, n, seed=0):
    rng = np.random.default_rng(seed)
    dim = 5 if task == "decoupled" else 4
    # small perturbations around hover-ish actions
    return rng.uniform(-0.2, 0.2, (n, dim))


@pytest.mark.parametrize("framework,task", [("MONO", "coupled"),
                                            ("MODUL", "decoupled"),
                                            ("MONO", "quad")])
def test_jax_matches_oracle_bitwise_eager(framework, task):
    """Full-trajectory *bitwise* parity in eager float64 (no XLA fusion, so
    every FLOP is the IEEE op the oracle performs in the same order).  The
    jitted path is covered by the teleported 1-ulp test below — XLA's
    fusion legally contracts a+b*c into (more accurate) FMA."""
    cfg = make_cfg(framework)
    onp.seed_all(1992)
    o = onp.OracleEnv(cfg, task)
    o.reset("train")
    s = state_from_oracle(cfg, o, jnp.float64)

    acts = hover_actions(task, 60)
    with jax.disable_jit():
        for i, a in enumerate(acts):
            obs_o, r_o, d_o = o.step(a)
            s, out = quad.step(cfg, s, jnp.asarray(a, jnp.float64), task)
            # state bitwise
            np.testing.assert_array_equal(np.asarray(s.x), o.x, err_msg=f"x step {i}")
            np.testing.assert_array_equal(np.asarray(s.v), o.v, err_msg=f"v step {i}")
            np.testing.assert_array_equal(np.asarray(s.R), o.R, err_msg=f"R step {i}")
            np.testing.assert_array_equal(np.asarray(s.W), o.W, err_msg=f"W step {i}")
            if task == "quad":
                # base env: obs is the raw packed state; reward uses
                # arccos (1-ulp libm slack); integrals untouched by step
                np.testing.assert_array_equal(np.asarray(out.obs), obs_o)
                np.testing.assert_allclose(np.asarray(out.reward), r_o,
                                           rtol=0, atol=1e-6)
                np.testing.assert_array_equal(np.asarray(out.done), d_o)
                if d_o.any():
                    break
                continue
            np.testing.assert_array_equal(np.asarray(s.eIx), o.eIx)
            # eIb1 flows through arctan2, whose last ulp differs between
            # numpy's libm and XLA — everything else is bitwise.
            np.testing.assert_allclose(float(s.eIb1), o.eIb1, rtol=0, atol=1e-13)
            # obs: bitwise except the two heading slots (float32 cast of the
            # 1-ulp arctan2 slack is almost always identical; allow one f32
            # ulp there).
            if task == "decoupled":
                np.testing.assert_array_equal(np.asarray(out.obs[0]), obs_o[0])
                np.testing.assert_allclose(np.asarray(out.obs[1]), obs_o[1],
                                           rtol=0, atol=2.4e-7)
            else:
                ob = np.asarray(out.obs)
                np.testing.assert_array_equal(ob[:18], obs_o[:18])
                np.testing.assert_array_equal(ob[20:], obs_o[20:])
                np.testing.assert_allclose(ob[18:20], obs_o[18:20],
                                           rtol=0, atol=2.4e-7)
            # rewards/done
            np.testing.assert_allclose(np.asarray(out.reward), r_o, rtol=0, atol=1e-6)
            np.testing.assert_array_equal(np.asarray(out.done), d_o)
            if d_o.any():
                break


@pytest.mark.parametrize("framework,task", [("MONO", "coupled"),
                                            ("MODUL", "decoupled")])
def test_jit_matches_oracle_one_ulp(framework, task):
    """Jit-compiled step, re-synchronized ('teleported') to the oracle state
    every step: per-step deviation must stay within FMA-contraction slack
    (~1 ulp), with no chaotic amplification in the measurement."""
    cfg = make_cfg(framework)
    onp.seed_all(7)
    o = onp.OracleEnv(cfg, task)
    o.reset("train")

    step = jax.jit(lambda st, a: quad.step(cfg, st, a, task))
    acts = hover_actions(task, 200, seed=3)
    for i, a in enumerate(acts):
        s = state_from_oracle(cfg, o, jnp.float64)
        obs_o, r_o, d_o = o.step(a)
        s, out = step(s, jnp.asarray(a, jnp.float64))
        for name, got, want in [("x", s.x, o.x), ("v", s.v, o.v),
                                ("R", s.R, o.R), ("W", s.W, o.W)]:
            np.testing.assert_allclose(
                np.asarray(got), want, rtol=1e-14, atol=1e-16,
                err_msg=f"{name} step {i}",
            )
        np.testing.assert_allclose(np.asarray(out.reward), r_o, rtol=0, atol=1e-6)
        if d_o.any():
            break


@pytest.mark.skipif(not HAS_REF, reason="reference checkout not available")
class TestGoldenVsReference:
    """Drive the actual reference implementation (read-only import) and the
    oracle from the same seed; assert near-bitwise agreement."""

    @pytest.fixture()
    def ref_modules(self, monkeypatch):
        monkeypatch.syspath_prepend(REF_PATH)
        monkeypatch.setattr(sys, "argv", ["main.py"])
        import importlib

        for m in list(sys.modules):
            if m.startswith(("gym_rotor", "args_parse", "utils")):
                sys.modules.pop(m)
        gr_quad = importlib.import_module("gym_rotor.envs.quad")
        gr_coupled = importlib.import_module("gym_rotor.wrappers.coupled_yaw_wrapper")
        yield gr_quad, gr_coupled
        for m in list(sys.modules):
            if m.startswith(("gym_rotor", "args_parse")):
                sys.modules.pop(m)

    def test_reset_matches_reference(self, ref_modules):
        _, gr_coupled = ref_modules
        env = gr_coupled.CoupledWrapper()
        onp.seed_all(1992)
        ref_state = env.reset(env_type="train", seed=1992)
        # np.random/python-random state is shared; replay with fresh seed
        onp.seed_all(1992)
        cfg = make_cfg("MONO")
        o = onp.OracleEnv(cfg, "coupled")
        o.reset("train")
        np.testing.assert_allclose(
            o.state18(), np.asarray(ref_state, np.float64), rtol=0, atol=1e-6
        )
        # full-precision comparison against the reference's float64 state
        np.testing.assert_allclose(o.state18(), env.state, rtol=0, atol=1e-12)
        assert o.p.m == env.m
        assert o.p.max_force == env.max_force

    def test_euler_trajectory_matches_reference(self, ref_modules):
        gr_quad, gr_coupled = ref_modules
        env = gr_coupled.CoupledWrapper()
        onp.seed_all(1992)
        env.reset(env_type="train", seed=1992)

        cfg = make_cfg("MONO")
        onp.seed_all(1992)
        o = onp.OracleEnv(cfg, "coupled")
        o.reset("train")
        np.testing.assert_allclose(o.state18(), env.state, atol=1e-12)

        acts = hover_actions("coupled", 200, seed=1)
        for i, a in enumerate(acts):
            # reference pipeline with the base env's Euler branch:
            env.action_wrapper(a.copy())
            env.ode_integrator = "euler"
            st = env.state.copy()
            gr_quad.QuadEnv.observation_wrapper(env, st)
            obs_ref = env.get_norm_error_state("MONO")
            rwd_ref = env.reward_wrapper(obs_ref)[0]
            done_ref = env.done_wrapper(obs_ref)[0]

            obs_o, r_o, d_o = o.step(a)
            np.testing.assert_allclose(
                o.state18(), env.state, rtol=0, atol=1e-11,
                err_msg=f"state mismatch at step {i}",
            )
            np.testing.assert_allclose(obs_o, obs_ref[0], rtol=0, atol=1e-5)
            assert bool(d_o[0]) == bool(done_ref)
            if d_o[0]:
                break
            # compare in the interp-mapped [0, 1] domain (quad.py:154-158)
            r_ref01 = np.interp(rwd_ref, [cfg.reward_min, 0.0], [0.0, 1.0])
            np.testing.assert_allclose(r_o, r_ref01, rtol=0, atol=1e-5)


def test_dop853_fixed_step_matches_scipy():
    """Fixed-step DOP853 vs scipy adaptive solve_ivp over one dt."""
    from scipy.integrate import solve_ivp

    from gym_rotor_tpu.envs import dynamics, params as params_lib
    from gym_rotor_tpu.ops import so3 as jso3

    p = params_lib.nominal(jnp.float64)
    rng = np.random.default_rng(7)
    x = rng.uniform(-0.5, 0.5, 3)
    v = rng.uniform(-1, 1, 3)
    W = rng.uniform(-2, 2, 3)
    R = np.asarray(jso3.euler_to_rot(jnp.asarray(rng.uniform(-0.8, 0.8, 3))))
    f, M = 21.0, np.array([0.05, -0.03, 0.01])
    J = np.asarray(p.J)
    m = float(p.m)

    def eom_np(t, s):
        x_, v_, Rv, W_ = s[0:3], s[3:6], s[6:15], s[15:18]
        R_ = Rv.reshape(3, 3).T
        xd = v_
        vd = np.array([0, 0, 9.81]) - f * R_[:, 2] / m
        Rd = R_ @ onp.hat(W_)
        Wd = (-(onp.hat(W_) @ np.diag(J)) @ W_ + M) / J
        return np.concatenate([xd, vd, Rd.T.reshape(9), Wd])

    s0 = np.concatenate([x, v, R.T.reshape(9), W])
    sol = solve_ivp(eom_np, [0, 1 / 200], s0, method="DOP853",
                    rtol=1e-12, atol=1e-12)
    ref = sol.y[:, -1]

    out = dynamics.integrate(
        "dop853", jnp.asarray(x), jnp.asarray(v), jnp.asarray(R),
        jnp.asarray(W), jnp.asarray(f, jnp.float64), jnp.asarray(M), p,
        jnp.asarray(1 / 200, jnp.float64),
    )
    got = np.concatenate(
        [np.asarray(out[0]), np.asarray(out[1]),
         np.asarray(out[2]).T.reshape(9), np.asarray(out[3])]
    )
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_rk4_close_to_dop853():
    from gym_rotor_tpu.envs import dynamics, params as params_lib
    from gym_rotor_tpu.ops import so3 as jso3

    p = params_lib.nominal(jnp.float64)
    x = jnp.zeros(3, jnp.float64)
    v = jnp.array([0.5, -0.2, 0.1], jnp.float64)
    W = jnp.array([1.0, -2.0, 0.5], jnp.float64)
    R = jso3.euler_to_rot(jnp.array([0.3, 0.2, -0.4], jnp.float64))
    f = jnp.asarray(22.0, jnp.float64)
    M = jnp.array([0.1, 0.05, -0.02], jnp.float64)
    dt = jnp.asarray(1 / 200, jnp.float64)
    a = dynamics.integrate("rk4", x, v, R, W, f, M, p, dt)
    b = dynamics.integrate("dop853", x, v, R, W, f, M, p, dt)
    for ya, yb in zip(a, b):
        np.testing.assert_allclose(ya, yb, rtol=1e-9, atol=1e-11)


# ----------------------------------------------------------------------------
# DOP853 behavioral equivalence, hardened: whole episodes, randomized-UDM
# params, aggressive near-termination states.  The reference integrates every
# env step with scipy's *adaptive* DOP853 at default tolerances
# (coupled_yaw_wrapper.py:62-64, rtol=1e-3/atol=1e-6); we take one fixed
# 12-stage DOP853 step per dt.  These tests bound the divergence of both
# against a tight-tolerance (1e-12) adaptive ground truth over whole
# episodes, in regimes where the adaptive solver actually sub-steps.
# ----------------------------------------------------------------------------


def _pack_state(x, v, R, W):
    return np.concatenate([np.asarray(x), np.asarray(v),
                           np.asarray(R).T.reshape(9), np.asarray(W)])


def _make_np_eom(p, f, M):
    J = np.asarray(p.J)
    m = float(p.m)

    def eom(t, s):
        v_ = s[3:6]
        R_ = s[6:15].reshape(3, 3).T
        W_ = s[15:18]
        xd = v_
        vd = np.array([0.0, 0.0, 9.81]) - f * R_[:, 2] / m
        Rd = R_ @ onp.hat(W_)
        Wd = (-(onp.hat(W_) @ np.diag(J)) @ W_ + M) / J
        return np.concatenate([xd, vd, Rd.T.reshape(9), Wd])
    return eom


@pytest.mark.parametrize("regime", ["nominal", "udm", "aggressive"])
def test_dop853_fixed_step_episode_equivalence(regime):
    """Whole-episode fixed-step vs adaptive DOP853 (200 steps = 1 s).

    Tracks (a) per-step divergence from a shared state — the local error of
    the fixed step against rtol=atol=1e-12 adaptive truth — and (b) freely
    accumulated trajectory divergence.  ``udm`` draws randomized quadrotor
    params (quad.py:359-387 scheme); ``aggressive`` starts tumbling near
    crash (large tilt/velocity/body rates, saturating wrench) where the
    adaptive solver sub-steps.  Measured bounds are recorded in
    docs/DESIGN.md §3."""
    from functools import partial

    from scipy.integrate import solve_ivp

    from gym_rotor_tpu.envs import dynamics
    from gym_rotor_tpu.envs import params as params_lib
    from gym_rotor_tpu.ops import so3 as jso3

    dt = 1.0 / 200.0
    steps = 200
    rng = np.random.default_rng({"nominal": 11, "udm": 12,
                                 "aggressive": 13}[regime])
    p = (params_lib.randomize(jax.random.PRNGKey(5), 10.0, jnp.float64)
         if regime == "udm" else params_lib.nominal(jnp.float64))
    hover = float(p.m) * 9.81

    if regime == "aggressive":
        x = rng.uniform(-1.5, 1.5, 3)
        v = rng.uniform(-3.0, 3.0, 3)
        W = rng.uniform(-5.0, 5.0, 3)
        eul = rng.uniform(-1.2, 1.2, 3)
        f_seq = rng.uniform(0.6, 1.4, steps) * hover
        M_seq = rng.uniform(-0.5, 0.5, (steps, 3))
    else:
        x = rng.uniform(-0.5, 0.5, 3)
        v = rng.uniform(-1.0, 1.0, 3)
        W = rng.uniform(-2.0, 2.0, 3)
        eul = rng.uniform(-0.8, 0.8, 3)
        f_seq = rng.uniform(0.9, 1.1, steps) * hover
        M_seq = rng.uniform(-0.1, 0.1, (steps, 3))

    R = np.asarray(jso3.euler_to_rot(jnp.asarray(eul)))
    step_fixed = jax.jit(partial(dynamics.integrate, "dop853"))

    def fixed_step_np(s, f, M):
        out = step_fixed(jnp.asarray(s[0:3]), jnp.asarray(s[3:6]),
                         jnp.asarray(s[6:15].reshape(3, 3).T),
                         jnp.asarray(s[15:18]),
                         jnp.asarray(f, jnp.float64), jnp.asarray(M), p,
                         jnp.asarray(dt, jnp.float64))
        return _pack_state(*out)

    def adaptive_step_np(s, f, M, **tol):
        sol = solve_ivp(_make_np_eom(p, f, M), [0, dt], s,
                        method="DOP853", **tol)
        return sol.y[:, -1]

    s_truth = _pack_state(x, v, R, W)
    s_ours = s_truth.copy()
    s_ref = s_truth.copy()   # reference-style: adaptive at DEFAULT tolerance
    per_step_max = 0.0
    nfev_total = 0
    for i in range(steps):
        f, M = float(f_seq[i]), M_seq[i]
        # (a) local: both from the same (truth) state
        ours_local = fixed_step_np(s_truth, f, M)
        sol = solve_ivp(_make_np_eom(p, f, M), [0, dt], s_truth,
                        method="DOP853", rtol=1e-12, atol=1e-12)
        truth_next = sol.y[:, -1]
        nfev_total += sol.nfev
        per_step_max = max(per_step_max,
                           np.abs(ours_local - truth_next).max())
        # (b) accumulated: each integrator advances its own trajectory
        s_ours = fixed_step_np(s_ours, f, M)
        s_ref = adaptive_step_np(s_ref, f, M)
        s_truth = truth_next

    acc_ours = np.abs(s_ours - s_truth).max()
    acc_ref = np.abs(s_ref - s_truth).max()
    # The adaptive solver never sub-steps at dt = 1/200 even at 1e-12
    # tolerance: nfev = 14/step is DOP853's single-accepted-step minimum
    # (12 stages + error/dense evals), so the fixed 12-stage step is the
    # SAME computation the adaptive path performs (measured: exactly 14 in
    # all three regimes; headroom for one scipy-version retry).
    assert nfev_total / steps < 27, nfev_total / steps
    # Local error of one fixed 12-stage step stays at machine epsilon even
    # while tumbling near crash (measured ≤4e-15; bound with headroom).
    assert per_step_max < 1e-9, per_step_max
    # Accumulated over a full 200-step episode the fixed-step path stays at
    # integration tolerance of truth (measured ≤2.2e-14), and within 10x of
    # the reference's own default-tolerance adaptive integration.
    assert acc_ours < 1e-5, acc_ours
    assert acc_ours < max(acc_ref, 1e-12) * 10.0, (acc_ours, acc_ref)
