"""Training driver CLI — the reference's Learner (main.py:37-421) rebuilt for
batched TPU training.

Usage mirrors the reference:
    python train.py --framework MONO --rl_algo TD3 --seed 1992 ...
plus TPU knobs: --num_envs, --updates_per_step, --rollout_len, --integrator.

Differences by design (SURVEY.md §7):
* ``num_envs`` lockstep environments collect experience per tick
  (total_timesteps advances by num_envs per tick); with ``--num_envs 1`` the
  loop degenerates to the reference's single-env semantics.
* There is ONE training path for any device count: the fused shard_map
  superstep (rollout -> replay -> pmean-reduced updates as one XLA program)
  over an ``env`` mesh axis.  On one chip that mesh has one device; on a pod
  the same program spans all chips.  ``--rollout_len`` ticks are fused per
  superstep call (1 = the reference's per-step train cadence).
* The Python loop only orchestrates: eval scheduling, model saving,
  checkpointing, logging.  All device work is jitted.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from gym_rotor_tpu.utils.jax_cache import enable_compile_cache

enable_compile_cache()

from gym_rotor_tpu.algos import ppo as ppo_lib
from gym_rotor_tpu.algos import replay as replay_lib
from gym_rotor_tpu.algos import sac as sac_lib
from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.envs import batch as batch_lib
from gym_rotor_tpu.envs import ref_stream
from gym_rotor_tpu.envs.quad import DT
from gym_rotor_tpu.models import ppo_models, sac_models, td3_models
from gym_rotor_tpu.parallel import mesh as mesh_lib
from gym_rotor_tpu.parallel.train_step import (init_ep_ret,
                                               make_sharded_ppo_superstep,
                                               make_sharded_td3_superstep,
                                               shard_replay)
from gym_rotor_tpu.utils import checkpoint as ckpt
from gym_rotor_tpu.utils import logging as logs
from gym_rotor_tpu.utils.config import Config, config_from_args

EVAL_SEED = 1992  # fixed eval seed (reference main.py:280-282)


def benchmark_reward(ex, eb1):
    """interp(-||ex|| - |eb1|, [-2, 0], [0, 1]) (utils/utils.py:42-47)."""
    r = -jnp.linalg.norm(ex, axis=-1) - jnp.abs(eb1)
    return jnp.clip((r + 2.0) / 2.0, 0.0, 1.0)


def build_eval_rollout(cfg: Config, act_eval):
    """Jitted batched eval rollout (reference eval_policy, main.py:270-404):
    cfg.num_eval envs in lockstep from PRNGKey(seed).

    ``act_eval(states, obs_tuple) -> joint action`` is any deterministic
    policy — the trained agents' actors, or an imported reference policy
    (utils/import_torch.py).

    Comparability (cfg.eval_stream): the reference evaluates 10 *sequential*
    episodes on one env seeded 1992 (main.py:280-314).  "parallel" (default)
    rolls 10 parallel envs keyed from PRNGKey(seed) — same initial-state
    distribution, different draws, so benchmark numbers compare across n=10
    episode samples (a few points of noise).  "reference" replays the
    reference's exact 13-uniform-per-episode reset stream on host
    (envs/ref_stream.py, golden-tested bit-exact) and rolls those identical
    episodes batched — benchmark numbers are then directly comparable, up to
    integrator tolerance (our fixed-step RK4 vs its adaptive DOP853).
    """
    if cfg.eval_stream not in ("parallel", "reference"):
        raise ValueError(
            f"unknown eval_stream {cfg.eval_stream!r}: "
            "expected 'parallel' or 'reference'")
    eval_cfg = cfg.replace(num_envs=cfg.num_eval)
    eval_steps = int(round(cfg.eval_max_steps / DT))

    def eval_rollout(states, key):
        if cfg.eval_stream == "reference":
            bs, obs = ref_stream.batched_reset_reference(eval_cfg,
                                                         seed=EVAL_SEED)
        else:
            bs, obs = batch_lib.batched_reset(eval_cfg, key, "eval")

        def body(carry, _):
            bs, obs, active, ep_rwd, bench, last_ex, last_eb1 = carry
            action = act_eval(states, obs)
            bs, out = batch_lib.batched_step(eval_cfg, bs, action, "eval")
            a = active[..., None]
            ep_rwd = ep_rwd + jnp.where(a, out.reward, 0.0)
            bench = bench + jnp.where(
                active, benchmark_reward(out.info["ex"],
                                         out.info["eb1"]), 0.0)
            last_ex = jnp.where(a, out.info["ex"], last_ex)
            last_eb1 = jnp.where(active, out.info["eb1"], last_eb1)
            # deactivate on crash (cap handled by loop length)
            active = active & ~jnp.any(out.info["crashed"], axis=-1)
            ys = None
            if cfg.save_log or cfg.render:
                # flight-log row for env 0 (reference main.py:343-352):
                # [action | state18 + eIx + eb1 + eIb1 | xd, vd, b1c, Wd]
                from gym_rotor_tpu.envs.state import pack_state
                e = jax.tree.map(lambda x: x[0], bs.env)
                s18 = pack_state(e.x, e.v, e.R, e.W)
                b3 = e.R[:, 2]
                b1c = e.goal.b1d - jnp.dot(e.goal.b1d, b3) * b3
                eb1 = out.info["eb1"][0]
                ys = jnp.concatenate([
                    action[0], s18, e.eIx, eb1[None], e.eIb1[None],
                    e.goal.xd, e.goal.vd, b1c, e.goal.Wd])
            return (bs, out.obs, active, ep_rwd, bench, last_ex,
                    last_eb1), ys

        n = eval_cfg.num_envs
        init = (
            bs, obs, jnp.ones((n,), bool),
            jnp.zeros((n, cfg.n_agents), jnp.float32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n,), jnp.float32),
        )
        (bs, obs, active, ep_rwd, bench, last_ex, last_eb1), rows = \
            jax.lax.scan(body, init, None, length=eval_steps)
        # success: full-length episode and |ex| <= 0.01
        # (+ |eb1| <= 0.01 for MODUL agent 2) (main.py:367-373)
        succ_pos = active & jnp.all(jnp.abs(last_ex) <= 0.01, axis=-1)
        if cfg.framework == "MODUL":
            succ_yaw = active & (jnp.abs(last_eb1) <= 0.01)
            success = jnp.stack([succ_pos, succ_yaw], axis=-1)
        else:
            success = succ_pos[..., None]
        return (ep_rwd.mean(0), bench.mean(0), success,
                last_ex.mean(0), last_eb1.mean(0), rows)

    return jax.jit(eval_rollout)


class Learner:
    def __init__(self, cfg: Config, model_dir="./models",
                 results_dir="./results"):
        self.cfg = cfg
        self.model_dir = model_dir
        self.results_dir = results_dir
        self.key = jax.random.PRNGKey(cfg.seed)

        n = cfg.n_agents
        if cfg.rl_algo == "TD3":
            self.agents = [td3_lib.TD3Agent(cfg, i, td3_models(cfg, i))
                           for i in range(n)]
        elif cfg.rl_algo == "SAC":
            self.agents = [sac_lib.SACAgent(cfg, i, sac_models(cfg, i))
                           for i in range(n)]
        elif cfg.rl_algo == "PPO":
            self.agents = [ppo_lib.PPOAgent(cfg, i, ppo_models(cfg, i))
                           for i in range(n)]
        else:
            raise ValueError(cfg.rl_algo)

        self.key, *aks = jax.random.split(self.key, n + 1)
        self.states = [a.init(k) for a, k in zip(self.agents, aks)]

        if cfg.rl_algo in ("TD3", "SAC"):
            self.replay = replay_lib.create(
                cfg.replay_buffer_size, cfg.obs_dim_n, cfg.action_dim_n)

        self.key, ek = jax.random.split(self.key)
        self.bstate, self.obs = batch_lib.batched_reset(cfg, ek, "train")

        self.total_timesteps = 0
        self.explor_noise_std = cfg.explor_noise_std_init
        self.noise_std_decay = (
            (cfg.explor_noise_std_init - cfg.explor_noise_std_min)
            / cfg.max_timesteps) if cfg.use_explor_noise_decay else 0.0

        self._build_eval()
        self.tb = logs.TensorBoard(
            cfg.save_tensorboard, results_dir,
            f"{cfg.rl_algo}_{cfg.seed}_{cfg.framework}")

    # ------------------------------------------------------------------
    def _build_eval(self):
        cfg, agents = self.cfg, self.agents

        def act_eval(states, obs):
            acts = []
            for i, a in enumerate(agents):
                if cfg.rl_algo == "TD3":
                    acts.append(a.act(states[i].actor, obs[i]))
                elif cfg.rl_algo == "SAC":
                    acts.append(a.choose_action(
                        states[i], obs[i], jax.random.PRNGKey(0),
                        is_eval=True))
                else:
                    act, _ = a.choose_action(states[i], obs[i], None,
                                             is_eval=True)
                    acts.append(act)
            return jnp.concatenate(acts, axis=-1)

        self._act_eval = jax.jit(act_eval)
        self._eval = build_eval_rollout(cfg, act_eval)

    # ------------------------------------------------------------------
    def load_best_actors(self):
        """Load saved actor weights for evaluation (--test_model): pick the
        newest matching checkpoint per agent (the reference hardcodes step
        counts at main.py:100-112; we take the latest save instead)."""
        import glob

        cfg = self.cfg
        for i in range(cfg.n_agents):
            pat = os.path.join(
                self.model_dir,
                f"{cfg.rl_algo}_{cfg.framework}_*agent_{i}*_{cfg.seed}"
                ".msgpack")
            cands = sorted(glob.glob(pat), key=os.path.getmtime)
            if not cands:
                raise FileNotFoundError(f"no actor checkpoint matches {pat}")
            actor = ckpt.load_actor(cands[-1], self.states[i].actor)
            self.states[i] = self.states[i].replace(actor=actor)
            print(f"agent {i}: loaded {cands[-1]}")
        return self

    # ------------------------------------------------------------------
    # Full-train-state checkpointing (what the reference lacks: optimizer,
    # replay cursor, RNG and step counters travel with the params —
    # SURVEY.md §5 "checkpoint/resume").
    def checkpoint_tree(self):
        tree = {
            "states": self.states,
            "key": self.key,
            "total_timesteps": self.total_timesteps,
            "explor_noise_std": self.explor_noise_std,
        }
        if self.cfg.rl_algo in ("TD3", "SAC") and self.cfg.checkpoint_replay:
            tree["replay"] = self.replay
        return tree

    def save_checkpoint(self, path=None):
        path = path or self.cfg.checkpoint_path
        return ckpt.save_train_state(path, self.checkpoint_tree())

    def load_checkpoint(self, path=None):
        path = path or self.cfg.checkpoint_path
        tree = ckpt.load_train_state(path, self.checkpoint_tree())
        self.states = tree["states"]
        self.key = tree["key"]
        self.total_timesteps = int(tree["total_timesteps"])
        self.explor_noise_std = float(tree["explor_noise_std"])
        if "replay" in tree:
            self.replay = tree["replay"]
        return self

    # ------------------------------------------------------------------
    def eval_policy(self):
        rewards, bench, success, ex, eb1, rows = self._eval(
            self.states, jax.random.PRNGKey(EVAL_SEED))
        if self.cfg.save_log and rows is not None:
            # write the env-0 flight log in the reference .dat format
            from datetime import datetime
            os.makedirs(self.results_dir, exist_ok=True)
            stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
            path = os.path.join(self.results_dir,
                                f"{self.cfg.framework}_log_{stamp}.dat")
            header = ("Actions and States\n"
                      "action[0], ..., state[0], ..., command[0], ...")
            np.savetxt(path, np.asarray(rows), header=header, fmt="%.10f")
            print(f"flight log saved: {path}")
        if self.cfg.render and rows is not None:
            self.render_rows(np.asarray(rows))
        rewards = np.asarray(rewards)
        print(
            f"total_timesteps: {self.total_timesteps} \t eval_reward: "
            f"{[round(float(r), 4) for r in rewards]} \t benchmark_reward: "
            f"{float(bench):.4f}")
        return rewards, float(bench), np.asarray(success)

    def render_rows(self, rows, max_frames=150):
        """Visualize env 0's eval flight (reference renders during eval
        behind --render, main.py:355-356; renderer quad.py:469-754).  Rows
        are the flight-log layout; on a headless backend the flight is saved
        as an animated GIF plus a final-frame PNG next to the logs."""
        from datetime import datetime

        from gym_rotor_tpu.render.renderer import Renderer

        na = sum(self.cfg.action_dim_n)
        s18 = rows[:, na:na + 18]
        cmd = rows[:, na + 18 + 5:]
        r = Renderer(capture=True)
        try:
            stride = max(1, len(rows) // max_frames)
            for row_s, row_c in zip(s18[::stride], cmd[::stride]):
                x = row_s[0:3]
                R = row_s[6:15].reshape(3, 3).T  # column-major (pack_state)
                xd, b1c = row_c[0:3], row_c[6:9]
                r.draw(x, R, xd, b1c)
            if not r.interactive:
                os.makedirs(self.results_dir, exist_ok=True)
                stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
                path = os.path.join(self.results_dir, f"render_{stamp}.png")
                r.save(path)
                gif = os.path.join(self.results_dir, f"render_{stamp}.gif")
                r.save_animation(gif)
                print(f"render saved: {path}, {gif}")
        finally:
            r.close()

    # ------------------------------------------------------------------
    def train_policy(self):
        """The single training path for any device count: fused shard_map
        superstep over the ``env`` mesh axis (rollout -> replay ->
        pmean-reduced updates), plus the reference driver's full artifact
        protocol (main.py:115-267): start_timesteps uniform-random warmup,
        periodic eval with best/solved actor saving, per-episode step log,
        TensorBoard losses, and full-train-state checkpointing."""
        cfg = self.cfg
        mesh = mesh_lib.make_mesh()
        n_dev = mesh.devices.size
        if cfg.num_envs % n_dev:
            raise ValueError(
                f"num_envs ({cfg.num_envs}) must divide the device count "
                f"({n_dev})")
        off_policy = cfg.rl_algo in ("TD3", "SAC")

        # place the state created in __init__ (or restored by resume)
        self.states = [jax.device_put(s, mesh_lib.replicated(mesh))
                       for s in self.states]
        self.bstate = mesh_lib.shard_batch(mesh, self.bstate)
        self.obs = mesh_lib.shard_batch(mesh, self.obs)
        if off_policy:
            self.replay = shard_replay(mesh, self.replay)
        ep_ret = init_ep_ret(cfg, mesh)

        if off_policy:
            rl = max(cfg.rollout_len, 1)
            n_updates = max(int(round(cfg.updates_per_step * rl)), 1)
            act_fn = None
            act_prep = None
            train_fn = None
            if cfg.rl_algo == "SAC":
                train_fn = sac_lib.train_step

                def act_prep(states):
                    # fold the actors once per rollout chunk (identity when
                    # cfg.equiv_fold is off)
                    return [a.fold_actor(states[i].actor)
                            for i, a in enumerate(self.agents)]

                def act_fn(folded_actors, ob, noise_std, k):
                    acts = []
                    for i, a in enumerate(self.agents):
                        k, sub = jax.random.split(k)
                        acts.append(a.choose_action_f(folded_actors[i],
                                                      ob[i], sub))
                    return jnp.concatenate(acts, axis=-1)

            step = make_sharded_td3_superstep(
                cfg, self.agents, mesh, rollout_len=rl, n_updates=n_updates,
                train_fn=train_fn, act_fn=act_fn, act_prep=act_prep)
        else:
            # on-policy: one superstep = exactly one T_horizon segment
            rl = max(cfg.T_horizon // cfg.num_envs, 1)
            n_updates = cfg.K_epochs
            step = make_sharded_ppo_superstep(cfg, self.agents, mesh,
                                              rollout_len=rl)
        steps_per_call = cfg.num_envs * rl
        print(f"training over {n_dev} device(s): {cfg.num_envs} envs, "
              f"rollout_len={rl}, "
              f"{n_updates} update{'s' if n_updates > 1 else ''}/superstep")

        tl = logs.TextLogs(self.results_dir, cfg.seed)
        thr = logs.Throughput()
        max_total_reward = [0.85 * cfg.eval_max_steps / DT] * cfg.n_agents
        next_eval = cfg.eval_freq
        if cfg.eval_freq < steps_per_call:
            print(f"note: eval_freq ({cfg.eval_freq}) < steps/superstep "
                  f"({steps_per_call}); evaluating once per superstep — "
                  f"raise --eval_freq for throughput")
        next_ckpt = (self.total_timesteps + cfg.checkpoint_freq
                     if cfg.checkpoint_freq else None)
        last_report = time.perf_counter()
        tb_on = self.tb.writer is not None

        while self.total_timesteps < cfg.max_timesteps:
            self.key, sub = jax.random.split(self.key)
            warm = off_policy and self.total_timesteps < cfg.start_timesteps
            if off_policy:
                (self.bstate, self.obs, self.replay, self.states, ep_ret,
                 metrics) = step(self.bstate, self.obs, self.replay,
                                 self.states, ep_ret, sub,
                                 self.explor_noise_std, warm=warm)
            else:
                self.bstate, self.obs, self.states, ep_ret, metrics = step(
                    self.bstate, self.obs, self.states, ep_ret, sub)
            self.total_timesteps += steps_per_call
            thr.add(env_steps=steps_per_call,
                    updates=0 if warm else n_updates)

            # per-episode reward log (reference main.py:218-223)
            fin_cnt = float(metrics["fin_cnt"])
            if fin_cnt > 0 and not warm:
                mean_ret = np.asarray(metrics["fin_sum"]) / fin_cnt
                tl.log_step(self.total_timesteps,
                            [round(float(r), 4) for r in mean_ret])
            # per-update losses to TensorBoard (reference main.py:188-209)
            if tb_on and not warm:
                for k, v in metrics.items():
                    if k not in ("fin_sum", "fin_cnt"):
                        self.tb.scalar(f"train/{k}", float(v),
                                       self.total_timesteps)

            if cfg.rl_algo == "TD3" and cfg.use_explor_noise_decay:
                self.explor_noise_std = max(
                    self.explor_noise_std
                    - self.noise_std_decay * steps_per_call,
                    cfg.explor_noise_std_min)

            # periodic eval + best/solved saving (reference main.py:242-264)
            if self.total_timesteps >= next_eval and not warm:
                rewards, bench, success = self.eval_policy()
                tl.log_eval(self.total_timesteps, bench, list(rewards))
                self.tb.scalar("reward/benchmark_reward", bench,
                               self.total_timesteps)
                for i, r in enumerate(rewards):
                    self.tb.scalar(f"reward/eval_reward{i}", r,
                                   self.total_timesteps)
                    if r > max_total_reward[i] and cfg.save_model:
                        max_total_reward[i] = r
                        ckpt.save_actor(
                            self.model_dir, self.states[i].actor,
                            cfg.rl_algo, cfg.framework, self.total_timesteps,
                            i, cfg.seed)
                    if success[:, i].all() and cfg.save_model:
                        ckpt.save_actor(
                            self.model_dir, self.states[i].actor,
                            cfg.rl_algo, cfg.framework, self.total_timesteps,
                            i, cfg.seed, solved=True)
                while next_eval <= self.total_timesteps:
                    next_eval += cfg.eval_freq

            if next_ckpt is not None and self.total_timesteps >= next_ckpt:
                self.save_checkpoint()
                next_ckpt += cfg.checkpoint_freq

            if time.perf_counter() - last_report > 10.0:
                es, us = thr.rates()
                print(f"t={self.total_timesteps}  env-steps/s={es:,.0f}  "
                      f"updates/s={us:,.1f}  noise={self.explor_noise_std:.3f}")
                last_report = time.perf_counter()

        tl.close()


def main(argv=None):
    cfg = config_from_args(argv)
    print("-" * 100)
    print(f"Framework: {cfg.framework} | Equivariant RL: {cfg.use_equiv} | "
          f"RL algorithm: {cfg.rl_algo} | Seed: {cfg.seed}")
    print(f"gamma: {cfg.discount} | lr_a: {list(cfg.lr_a)} | "
          f"lr_c: {list(cfg.lr_c)} | num_envs: {cfg.num_envs} | "
          f"integrator: {cfg.integrator}")
    print("-" * 100)
    learner = Learner(cfg)
    if cfg.test_model:
        # evaluation-only mode (reference main.py:100-112, 397)
        learner.load_best_actors()
        learner.eval_policy()
        return learner
    if cfg.resume and os.path.exists(cfg.checkpoint_path):
        learner.load_checkpoint()
        print(f"resumed from {cfg.checkpoint_path} at "
              f"t={learner.total_timesteps}")
    learner.eval_policy()
    with logs.profiler_trace(cfg.profile_dir or None):
        learner.train_policy()
    return learner


if __name__ == "__main__":
    main()
