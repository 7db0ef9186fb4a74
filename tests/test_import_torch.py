"""Cross-validation against the reference's own trained checkpoints: import
the shipped .pth actors (reference models/, load path algos/td3/td3.py:224-238)
as exact JAX policies and fly them in OUR environment — the imported policy
must reproduce the reference's logged eval benchmark (~928-941/1000 for the
MODUL flagship, results/log_eval_seed_1992.txt).

Requires the reference mount + torch; skipped otherwise.
"""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "models")),
    reason="reference checkpoints not mounted")


def _eval_imported(framework, checkpoints, eval_stream="parallel"):
    import train as train_mod
    from gym_rotor_tpu.utils import import_torch
    from gym_rotor_tpu.utils.config import Config

    params_n, _ = import_torch.load_reference_td3_actors(
        REF, framework, checkpoints, seed=1992)
    cfg = Config(framework=framework,
                 module_training="DTDE" if framework == "MODUL" else "CTDE",
                 num_eval=10, seed=1992, save_log=False,
                 eval_stream=eval_stream)
    rollout = train_mod.build_eval_rollout(
        cfg, import_torch.reference_actor_policy(params_n))
    rewards, bench, success, ex, eb1, _ = rollout(
        None, jax.random.PRNGKey(1992))
    return np.asarray(rewards), float(bench), np.asarray(success)


def test_imported_modul_policy_reproduces_reference_benchmark():
    """The reference's best shipped MODUL pair (564k module 1 + 850k module 2)
    logged benchmark ~928-941 (results/log_eval_seed_1992.txt tail); the
    imported policy must land in that band (n=10 eval noise is a few pts)."""
    rewards, bench, success = _eval_imported("MODUL", [
        (os.path.join(REF, "models",
                      "TD3_MODUL_564.0k_steps_agent_0_1992.pth"), 0),
        (os.path.join(REF, "models",
                      "TD3_MODUL_850.0k_steps_agent_1_1992.pth"), 1),
    ])
    assert 900.0 < bench <= 1000.0, bench
    assert rewards.min() > 900.0          # both modules fly well
    assert success[:, 1].mean() >= 0.8    # yaw module consistently converges


def test_imported_mono_policy_flies_in_our_env():
    """The shipped MONO actor (700k steps) imported through the same path
    scores a benchmark consistent with a trained policy (the reference's MONO
    runs plateau in the low 900s, README.md:130-137 curves)."""
    rewards, bench, success = _eval_imported("MONO", [
        (os.path.join(REF, "models",
                      "TD3_MONO_700.0k_steps_agent_0_1992.pth"), 0),
    ])
    assert 880.0 < bench <= 1000.0, bench
    assert rewards.min() > 900.0


def test_imported_modul_policy_on_reference_eval_stream():
    """Strongest cross-validation: the reference's own trained MODUL pair,
    flown on the reference's *exact* seed-1992 eval episodes (initial states
    + headings replayed bit-exactly, envs/ref_stream.py) in our dynamics —
    the only remaining differences are f32 vs f64 and fixed-step RK4 vs
    adaptive DOP853.  Must land in the reference's own logged band (928-941,
    results/log_eval_seed_1992.txt rows 980k-994k)."""
    rewards, bench, success = _eval_imported("MODUL", [
        (os.path.join(REF, "models",
                      "TD3_MODUL_564.0k_steps_agent_0_1992.pth"), 0),
        (os.path.join(REF, "models",
                      "TD3_MODUL_850.0k_steps_agent_1_1992.pth"), 1),
    ], eval_stream="reference")
    assert 910.0 < bench <= 1000.0, bench
    assert rewards.min() > 900.0
