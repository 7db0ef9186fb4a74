"""Cross-validate the reference's shipped trained actors in our engine.

Imports the reference's .pth checkpoints (utils/import_torch.py) and
evaluates them under both eval streams (README "Cross-validation" numbers):

* parallel  — 10 envs keyed from PRNGKey(1992), same distribution as the
  reference eval (main.py:280-314), different draws;
* reference — the reference's exact sequential seed-1992 eval episodes,
  initial states replayed bit-exactly (envs/ref_stream.py).

Run on CPU in float32 (the engine's training/eval precision):
    python scripts/eval_imported_reference.py
"""
import jax

jax.config.update("jax_platforms", "cpu")

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as train_mod
from gym_rotor_tpu.utils import import_torch
from gym_rotor_tpu.utils.config import Config

REF = "/root/reference"


def main():
    for framework, ckpts, mt in [
        ("MODUL",
         [(os.path.join(REF, "models",
                        "TD3_MODUL_564.0k_steps_agent_0_1992.pth"), 0),
          (os.path.join(REF, "models",
                        "TD3_MODUL_850.0k_steps_agent_1_1992.pth"), 1)],
         "DTDE"),
        ("MONO",
         [(os.path.join(REF, "models",
                        "TD3_MONO_700.0k_steps_agent_0_1992.pth"), 0)],
         "CTDE"),
    ]:
        params_n, _ = import_torch.load_reference_td3_actors(
            REF, framework, ckpts, seed=1992)
        for stream in ["reference", "parallel"]:
            cfg = Config(framework=framework, module_training=mt,
                         num_eval=10, seed=1992, save_log=False,
                         eval_stream=stream)
            rollout = train_mod.build_eval_rollout(
                cfg, import_torch.reference_actor_policy(params_n))
            rewards, bench, success, ex, eb1, _ = rollout(
                None, jax.random.PRNGKey(1992))
            print(f"{framework} stream={stream}: bench={float(bench):.1f} "
                  f"rewards={np.asarray(rewards).round(1).tolist()} "
                  f"success={np.asarray(success).mean(0).round(2).tolist()}")


if __name__ == "__main__":
    main()
