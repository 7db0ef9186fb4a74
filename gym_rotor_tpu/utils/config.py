"""Single explicit configuration object for the whole framework.

The reference scatters configuration across an argparse parser that is
re-instantiated and re-parsed inside seven different modules
(reference args_parse.py:4-80; re-parse sites quad.py:24-25,
coupled_yaw_wrapper.py:18-19, decoupled_yaw_wrapper.py:19-20,
trajectory_generator.py:13-14, draw_plot.py:22-23, main.py:409-410).
Here the entire configuration is one frozen, hashable dataclass that is
threaded explicitly and can be used as a static jit argument; env math reads
values out of it at trace time so they compile to constants.

Defaults replicate reference args_parse.py:6-78 exactly.
"""
from __future__ import annotations

import argparse
import dataclasses
import math
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class Config:
    # -- run control (reference args_parse.py:6-11)
    seed: int = 1992
    save_model: bool = True
    save_tensorboard: bool = False
    test_model: bool = False
    save_log: bool = False
    render: bool = False

    # -- environment (reference args_parse.py:14-20)
    framework: str = "MODUL"          # "MONO" | "MODUL"
    module_training: str = "DTDE"     # "DTDE" | "CTDE"
    max_steps: int = 4000
    max_timesteps: int = 2_000_000
    num_eval: int = 10
    eval_freq: int = 2000
    eval_max_steps: int = 5           # [sec]

    # -- reward coefficients (reference args_parse.py:23-32)
    Cx: float = 6.0
    CIx: float = 0.1
    Cv: float = 0.4
    Cw12: float = 0.6
    alpha: float = 0.01
    Cb1: float = 6.0
    CIb1: float = 0.1
    CW3: float = 0.1
    beta: float = 0.05

    # -- domain randomization (reference args_parse.py:34-35)
    use_UDM: bool = True
    UDM_percentage: float = 10.0

    # -- agent (reference args_parse.py:38-47)
    rl_algo: str = "TD3"              # "TD3" | "SAC" | "PPO"
    use_equiv: bool = True
    # Fold the equivariant projection once per use-site instead of on every
    # forward (SURVEY §7.5).  Forward-bitwise-identical to the reference's
    # project-every-forward semantics (nn.py:26-36); gradients agree up to fp
    # summation order where one fold fans out to several forwards (CAPS,
    # CTDE, rollout acting).  Opt-in: default keeps exact reference autodiff.
    equiv_fold: bool = False
    actor_hidden_dim: Tuple[int, ...] = (16, 4)
    critic_hidden_dim: int = 62
    lr_a: Tuple[float, ...] = (3e-4, 3e-4)
    lr_c: Tuple[float, ...] = (2e-4, 2e-4)
    discount: float = 0.99
    max_action: float = 1.0
    use_clip_grad_norm: bool = True
    grad_max_norm: float = 100.0

    # -- off-policy (reference args_parse.py:49-52)
    start_timesteps: int = 500_000
    batch_size: int = 256
    replay_buffer_size: int = 1_000_000
    tau: float = 0.005

    # -- TD3 (reference args_parse.py:54-59)
    use_explor_noise_decay: bool = True
    explor_noise_std_init: float = 0.3
    explor_noise_std_min: float = 0.05
    target_noise: float = 0.2
    noise_clip: float = 0.5
    policy_update_freq: int = 3

    # -- SAC (reference args_parse.py:61-62)
    sac_alpha: float = 0.05
    automatic_entropy_tuning: bool = False

    # -- PPO (reference args_parse.py:65-73)
    T_horizon: int = 7000
    GAE_lambda: float = 0.9
    clip_rate: float = 0.2
    K_epochs: int = 20
    l2_reg: float = 1e-4
    entropy_coef: float = 1e-2
    entropy_coef_decay: float = 0.99
    actor_batch_size: int = 128
    critic_batch_size: int = 128

    # -- CAPS smoothness (reference args_parse.py:76-78)
    lam_T: float = 0.4
    lam_S: float = 0.3
    lam_M: float = 0.6

    # ------------------------------------------------------------------
    # TPU-framework-only knobs (no reference counterpart — these are the
    # capability-gap components of SURVEY.md §2 rows 30-32).
    # ------------------------------------------------------------------
    num_envs: int = 4096              # batched lockstep envs per chip
    integrator: str = "rk4"           # "euler" | "rk4" | "dop853"
    exact_so3: bool = False           # conditional-SVD reorthonormalization
                                      # (parity path) vs fast polar iteration
    train_traj_mode: int = 0          # trajectory mode during training
    updates_per_step: float = 1.0     # learner updates per env-batch step
    mesh_axis: str = "env"            # name of the data-parallel mesh axis
    rollout_len: int = 1              # env ticks fused per training superstep
                                      # (1 = reference per-step cadence; 50+
                                      # amortizes launch overhead at scale)
    checkpoint_freq: int = 0          # full-train-state ckpt every N steps
                                      # (0 = actor-only saving like reference)
    checkpoint_path: str = "./models/train_state.msgpack"
    resume: bool = False              # resume from checkpoint_path
    checkpoint_replay: bool = False   # include the replay ring in the ckpt
    profile_dir: str = ""             # capture a jax.profiler trace here
    eval_stream: str = "parallel"     # "parallel": num_eval envs keyed from
                                      # PRNGKey(seed) (same distribution as
                                      # the reference eval, different draws);
                                      # "reference": bit-exact replay of the
                                      # reference's sequential seed-1992 eval
                                      # episodes (envs/ref_stream.py)

    # ------------------------------------------------------------------
    # Derived quantities (reference quad.py:71-88).
    # ------------------------------------------------------------------
    @property
    def reward_min(self) -> float:
        # quad.py:81 with CW := args.Cw12 (quad.py:80)
        return -math.ceil(self.Cx + self.CIx + self.Cv + self.Cb1 + self.CIb1 + self.Cw12)

    @property
    def reward_min_1(self) -> float:
        return -math.ceil(self.Cx + self.CIx + self.Cv + self.Cw12)

    @property
    def reward_min_2(self) -> float:
        return -math.ceil(self.Cb1 + self.CW3 + self.CIb1)

    @property
    def n_agents(self) -> int:
        return 2 if self.framework == "MODUL" else 1

    @property
    def obs_dim_n(self) -> Tuple[int, ...]:
        # reference main.py:48-59
        return (15, 3) if self.framework == "MODUL" else (23,)

    @property
    def action_dim_n(self) -> Tuple[int, ...]:
        return (4, 1) if self.framework == "MODUL" else (4,)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _add_bool(parser, name, default, help=""):
    parser.add_argument(
        name, default=default, type=lambda x: str(x).lower() in ("true", "1", "yes"),
        help=help,
    )


def create_parser() -> argparse.ArgumentParser:
    """CLI mirroring reference args_parse.py plus TPU knobs."""
    p = argparse.ArgumentParser(
        description="TPU-native modular RL for quadrotor UAV control"
    )
    defaults = Config()
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        d = getattr(defaults, f.name)
        if isinstance(d, bool):
            _add_bool(p, name, d)
        elif isinstance(d, tuple):
            p.add_argument(name, default=list(d), nargs="+",
                           type=type(d[0]) if d else float)
        else:
            p.add_argument(name, default=d, type=type(d))
    return p


def config_from_args(argv: Optional[list] = None) -> Config:
    args = create_parser().parse_args(argv)
    kw = {}
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name)
        if isinstance(v, list):
            v = tuple(v)
        kw[f.name] = v
    return Config(**kw)
