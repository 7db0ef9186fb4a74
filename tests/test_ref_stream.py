"""Reference eval-stream replay (envs/ref_stream.py): bit-exact goldens
against the actual reference, and the batched reference-stream eval path."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_rotor_tpu.envs import ref_stream
from gym_rotor_tpu.utils.config import Config

REF_PATH = "/root/reference"
HAS_REF = os.path.isdir(REF_PATH)


def _pop_ref_modules():
    for m in list(sys.modules):
        if (m.startswith(("gym_rotor.", "args_parse", "utils."))
                or m in ("gym_rotor", "utils")):
            sys.modules.pop(m)


@pytest.mark.skipif(not HAS_REF, reason="reference checkout not available")
def test_inits_match_reference_bitwise(monkeypatch):
    """Drive the actual reference eval protocol (set_seed(1992) -> 10 x
    [reset('eval') + mark_traj_start + first mode-0 get_desired],
    main.py:280-314) and assert our host replay reproduces every episode's
    initial state and heading goal bit-for-bit."""
    monkeypatch.syspath_prepend(REF_PATH)
    monkeypatch.setattr(sys, "argv", ["main.py", "--framework", "MONO"])
    _pop_ref_modules()
    import importlib

    wrap_mod = importlib.import_module(
        "gym_rotor.wrappers.coupled_yaw_wrapper")
    traj_mod = importlib.import_module("utils.trajectory_generator")
    utils_mod = importlib.import_module("utils.utils")

    env = wrap_mod.CoupledWrapper()
    tg = traj_mod.TrajectoryGenerator(env)
    utils_mod.set_seed(env, 1992)

    ours = ref_stream.reference_eval_inits(num_eval=10, seed=1992)
    for ep in range(10):
        env.reset(env_type="eval", seed=1992)
        tg.mark_traj_start(env.get_current_state())
        xd, vd, b1d, b1d_dot, Wd = tg.get_desired(
            env.get_current_state(), 0)
        s = env.get_current_state()
        np.testing.assert_array_equal(ours["x"][ep], s[0:3],
                                      err_msg=f"x, episode {ep}")
        np.testing.assert_array_equal(ours["v"][ep], s[3:6])
        np.testing.assert_array_equal(ours["W"][ep], s[15:18])
        np.testing.assert_array_equal(
            ours["R"][ep], s[6:15].reshape(3, 3, order="F"),
            err_msg=f"R, episode {ep}")
        np.testing.assert_array_equal(ours["b1d"][ep], b1d,
                                      err_msg=f"b1d, episode {ep}")
        assert np.all(xd == 0.0) and np.all(vd == 0.0)
    _pop_ref_modules()


def test_inits_deterministic_and_nontrivial():
    a = ref_stream.reference_eval_inits(10, 1992)
    b = ref_stream.reference_eval_inits(10, 1992)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # eval protocol: positions in +-0.4, exact zero velocity/rates,
    # R = Rz(yaw) (roll = pitch = 0), distinct episodes
    assert np.all(np.abs(a["x"]) <= 0.4)
    assert np.all(a["v"] == 0.0) and np.all(a["W"] == 0.0)
    I = np.einsum("nij,nkj->nik", a["R"], a["R"])
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(3), (10, 3, 3)),
                               atol=1e-12)
    np.testing.assert_allclose(a["R"][:, 2, 2], 1.0, atol=1e-15)
    assert len({tuple(x) for x in a["x"].round(12)}) == 10
    # heading is unit-norm, z = 0
    np.testing.assert_allclose(np.linalg.norm(a["b1d"], axis=1), 1.0,
                               atol=1e-12)
    np.testing.assert_allclose(a["b1d"][:, 2], 0.0, atol=1e-15)


def test_batched_reset_reference_lifts_inits():
    cfg = Config(framework="MONO", num_envs=6, num_eval=6)
    inits = ref_stream.reference_eval_inits(6, 1992)
    bs, obs = ref_stream.batched_reset_reference(cfg, seed=1992)
    np.testing.assert_allclose(np.asarray(bs.env.x),
                               inits["x"].astype(np.float32), rtol=0,
                               atol=0)
    np.testing.assert_allclose(np.asarray(bs.env.R),
                               inits["R"].astype(np.float32), rtol=0,
                               atol=0)
    np.testing.assert_allclose(np.asarray(bs.traj.b1d),
                               inits["b1d"].astype(np.float32), rtol=0,
                               atol=0)
    # mode-0 zero setpoint, heading frozen (init_b1d consumed on host)
    assert np.all(np.asarray(bs.traj.xd) == 0.0)
    assert not np.any(np.asarray(bs.traj.init_b1d))
    np.testing.assert_allclose(np.asarray(bs.env.goal.b1d),
                               inits["b1d"].astype(np.float32), rtol=0,
                               atol=0)
    assert np.all(np.isfinite(np.asarray(obs[0])))


def test_reference_stream_rejects_tracking_modes():
    cfg = Config(framework="MONO", num_envs=4, num_eval=4,
                 train_traj_mode=2)
    with pytest.raises(ValueError):
        ref_stream.batched_reset_reference(cfg)


@pytest.mark.parametrize("framework", ["MONO", "MODUL"])
def test_eval_rollout_reference_stream_runs(framework):
    """build_eval_rollout with eval_stream='reference' executes end-to-end
    and scores a plausible hover-ish benchmark for the zero action."""
    import train as train_mod

    cfg = Config(framework=framework, num_eval=4, num_envs=4,
                 eval_stream="reference", eval_max_steps=1,
                 use_equiv=False)
    adim = sum(cfg.action_dim_n)

    def act_eval(states, obs):
        n = obs[0].shape[0]
        return jnp.zeros((n, adim), jnp.float32)

    rollout = train_mod.build_eval_rollout(cfg, act_eval)
    ep_rwd, bench, success, last_ex, last_eb1, rows = rollout(
        None, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(ep_rwd)))
    assert 0.0 <= float(bench) <= 200.0
    # identical episodes every call (stream is fixed), regardless of key
    ep2, bench2, *_ = rollout(None, jax.random.PRNGKey(123))
    np.testing.assert_array_equal(np.asarray(ep_rwd), np.asarray(ep2))
    np.testing.assert_array_equal(np.asarray(bench), np.asarray(bench2))
