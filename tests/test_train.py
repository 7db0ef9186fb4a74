"""Driver-level smoke tests: run train.main for a few hundred tiny steps per
algorithm family and assert the full artifact protocol works — eval fires,
text logs appear, the full-train-state checkpoint round-trips bit-identically,
and --test_model loads the actors it just wrote (reference main.py:407-421).
"""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as train_mod
from gym_rotor_tpu.utils import checkpoint as ckpt

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="wants the virtual multi-device mesh")


def _base_args(tmp):
    return [
        "--num_envs", "8", "--max_steps", "64", "--eval_max_steps", "1",
        "--num_eval", "4", "--seed", "7",
        "--replay_buffer_size", "512", "--batch_size", "32",
        "--checkpoint_path", os.path.join(str(tmp), "train_state.msgpack"),
    ]


def _run(tmp, monkeypatch, extra):
    monkeypatch.chdir(tmp)
    return train_mod.main(_base_args(tmp) + extra)


def test_td3_modul_driver_smoke(tmp_path, monkeypatch):
    """TD3 MODUL crossing the warmup boundary, with eval + ckpt + resume."""
    learner = _run(tmp_path, monkeypatch, [
        "--framework", "MODUL", "--rl_algo", "TD3",
        "--use_equiv", "False",
        "--max_timesteps", "256", "--start_timesteps", "64",
        "--eval_freq", "96", "--updates_per_step", "2",
        "--checkpoint_freq", "128",
    ])
    assert learner.total_timesteps >= 256
    # text logs written
    assert os.path.exists(tmp_path / "results" / "log_eval_seed_7.txt")
    evals = (tmp_path / "results" / "log_eval_seed_7.txt").read_text()
    assert len(evals.strip().splitlines()) >= 1  # eval fired past warmup
    # learner actually updated past warmup
    assert int(learner.states[0].total_it) > 0

    # full-train-state checkpoint round-trips bit-identically
    assert os.path.exists(tmp_path / "train_state.msgpack")
    cfg = learner.cfg
    fresh = train_mod.Learner(cfg)
    fresh.load_checkpoint(str(tmp_path / "train_state.msgpack"))
    for a, b in zip(jax.tree.leaves(learner.states),
                    jax.tree.leaves(fresh.states)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # --test_model loads saved actors and evaluates (save one deterministically
    # since the 0.85 best-reward bar is rarely cleared in a smoke run)
    for i in range(cfg.n_agents):
        ckpt.save_actor("./models", learner.states[i].actor, cfg.rl_algo,
                        cfg.framework, 256, i, cfg.seed)
    tm = train_mod.main(_base_args(tmp_path) + [
        "--framework", "MODUL", "--rl_algo", "TD3", "--use_equiv", "False",
        "--test_model", "True",
    ])
    for i in range(cfg.n_agents):
        for a, b in zip(jax.tree.leaves(tm.states[i].actor),
                        jax.tree.leaves(learner.states[i].actor)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sac_mono_driver_smoke(tmp_path, monkeypatch):
    """SAC driver smoke, doubling as the eval-artifact check: --save_log
    writes the reference-format .dat flight log and --render saves the
    offscreen PNG + GIF of env 0's eval flight (reference main.py:355-356)."""
    learner = _run(tmp_path, monkeypatch, [
        "--framework", "MONO", "--rl_algo", "SAC", "--use_equiv", "False",
        "--max_timesteps", "128", "--start_timesteps", "32",
        "--eval_freq", "64", "--updates_per_step", "1",
        "--save_log", "True", "--render", "True",
    ])
    assert learner.total_timesteps >= 128
    assert int(learner.states[0].total_it) > 0
    results = tmp_path / "results"
    assert os.path.exists(results / "log_eval_seed_7.txt")
    names = os.listdir(results)
    assert any(n.startswith("MONO_log_") and n.endswith(".dat")
               for n in names), names
    assert any(n.startswith("render_") and n.endswith(".png")
               for n in names), names
    assert any(n.startswith("render_") and n.endswith(".gif")
               for n in names), names


def test_ppo_mono_driver_smoke(tmp_path, monkeypatch):
    learner = _run(tmp_path, monkeypatch, [
        "--framework", "MONO", "--rl_algo", "PPO", "--use_equiv", "False",
        "--max_timesteps", "256", "--T_horizon", "64",
        "--K_epochs", "2", "--actor_batch_size", "16",
        "--critic_batch_size", "16", "--eval_freq", "64",
    ])
    assert learner.total_timesteps >= 256
    # 256 steps / (T_horizon=64 per superstep) = 4 PPO updates
    assert int(learner.states[0].total_it) == 4


def test_reference_eval_stream_driver_smoke(tmp_path, monkeypatch):
    """--eval_stream reference wires the replayed reference eval episodes
    (envs/ref_stream.py) through the driver: eval fires on the replayed
    stream and logs (reference main.py:280-314 protocol, same episodes)."""
    learner = _run(tmp_path, monkeypatch, [
        "--framework", "MODUL", "--rl_algo", "TD3", "--use_equiv", "False",
        "--max_timesteps", "128", "--start_timesteps", "32",
        "--eval_freq", "64", "--updates_per_step", "1",
        "--eval_stream", "reference",
    ])
    assert learner.total_timesteps >= 128
    evals = (tmp_path / "results" / "log_eval_seed_7.txt").read_text()
    assert len(evals.strip().splitlines()) >= 1


def test_unknown_eval_stream_rejected(tmp_path, monkeypatch):
    with pytest.raises(ValueError, match="eval_stream"):
        _run(tmp_path, monkeypatch, [
            "--framework", "MONO", "--rl_algo", "TD3", "--use_equiv",
            "False", "--max_timesteps", "64", "--eval_stream", "bogus",
        ])


def test_resume_continues_from_checkpoint(tmp_path, monkeypatch):
    """--resume picks up total_timesteps/params from the checkpoint."""
    _run(tmp_path, monkeypatch, [
        "--framework", "MONO", "--rl_algo", "TD3", "--use_equiv", "False",
        "--max_timesteps", "128", "--start_timesteps", "32",
        "--eval_freq", "64", "--checkpoint_freq", "64",
        "--checkpoint_replay", "True",
    ])
    resumed = _run(tmp_path, monkeypatch, [
        "--framework", "MONO", "--rl_algo", "TD3", "--use_equiv", "False",
        "--max_timesteps", "192", "--start_timesteps", "32",
        "--eval_freq", "64", "--resume", "True",
    ])
    assert resumed.total_timesteps >= 192
    assert int(resumed.replay.filled) > 0

def test_td3_emlp_fold_driver_smoke(tmp_path, monkeypatch):
    """--equiv_fold True threads through config_from_args into the flagship
    EMLP path end-to-end: warmup boundary crossed, learner updated, eval
    fired.  (Function-equivalence of the fold itself is proven in
    tests/test_fold.py; this guards the driver plumbing.)"""
    learner = _run(tmp_path, monkeypatch, [
        "--framework", "MODUL", "--rl_algo", "TD3",
        "--use_equiv", "True", "--equiv_fold", "True",
        "--max_timesteps", "128", "--start_timesteps", "32",
        "--eval_freq", "64", "--updates_per_step", "1",
    ])
    assert learner.cfg.equiv_fold
    assert learner.total_timesteps >= 128
    assert int(learner.states[0].total_it) > 0
    assert os.path.exists(tmp_path / "results" / "log_eval_seed_7.txt")
    for leaf in jax.tree.leaves(learner.states[0].actor):
        assert np.isfinite(np.asarray(leaf)).all()
