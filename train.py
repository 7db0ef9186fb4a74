"""Training driver CLI — the reference's Learner (main.py:37-421) rebuilt for
batched TPU training.

Usage mirrors the reference:
    python train.py --framework MONO --rl_algo TD3 --seed 1992 ...
plus TPU knobs: --num_envs, --updates_per_step, --integrator.

Differences by design (SURVEY.md §7):
* ``num_envs`` lockstep environments collect experience per tick
  (total_timesteps advances by num_envs per tick); with ``--num_envs 1`` the
  loop degenerates to the reference's single-env semantics.
* All hot paths (action selection, env tick, replay insert, learner updates,
  the whole eval rollout) are jit-compiled; the Python loop only orchestrates.
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

from gym_rotor_tpu.algos import ppo as ppo_lib
from gym_rotor_tpu.algos import replay as replay_lib
from gym_rotor_tpu.algos import sac as sac_lib
from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.envs import batch as batch_lib
from gym_rotor_tpu.envs.quad import DT
from gym_rotor_tpu.models import ppo_models, sac_models, td3_models
from gym_rotor_tpu.utils import checkpoint as ckpt
from gym_rotor_tpu.utils import logging as logs
from gym_rotor_tpu.utils.config import Config, config_from_args

EVAL_SEED = 1992  # fixed eval seed (reference main.py:280-282)


def benchmark_reward(ex, eb1):
    """interp(-||ex|| - |eb1|, [-2, 0], [0, 1]) (utils/utils.py:42-47)."""
    r = -jnp.linalg.norm(ex, axis=-1) - jnp.abs(eb1)
    return jnp.clip((r + 2.0) / 2.0, 0.0, 1.0)


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
            self.train_fn = td3_lib.train_step
        elif cfg.rl_algo == "SAC":
            self.agents = [sac_lib.SACAgent(cfg, i, sac_models(cfg, i))
                           for i in range(n)]
            self.train_fn = sac_lib.train_step
        elif cfg.rl_algo == "PPO":
            self.agents = [ppo_lib.PPOAgent(cfg, i, ppo_models(cfg, i))
                           for i in range(n)]
            self.train_fn = ppo_lib.train_step
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

        self._build_jitted()
        self.tb = logs.TensorBoard(
            cfg.save_tensorboard, results_dir,
            f"{cfg.rl_algo}_{cfg.seed}_{cfg.framework}")

    # ------------------------------------------------------------------
    def _build_jitted(self):
        cfg, agents = self.cfg, self.agents

        def act_train(states, obs, noise_std, key):
            acts = []
            logps = []
            for i, a in enumerate(agents):
                key, sub = jax.random.split(key)
                if cfg.rl_algo == "TD3":
                    acts.append(a.choose_action(states[i], obs[i], noise_std,
                                                sub))
                    logps.append(jnp.zeros_like(acts[-1]))
                elif cfg.rl_algo == "SAC":
                    acts.append(a.choose_action(states[i], obs[i], sub))
                    logps.append(jnp.zeros_like(acts[-1]))
                else:
                    act, logp = a.choose_action(states[i], obs[i], sub)
                    acts.append(act)
                    logps.append(logp)
            return jnp.concatenate(acts, axis=-1), tuple(acts), tuple(logps)

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

        self._act_train = jax.jit(act_train)
        self._act_eval = jax.jit(act_eval)
        self._env_step = jax.jit(
            lambda bs, a: batch_lib.batched_step(cfg, bs, a))

        def random_actions(key):
            return jax.random.uniform(
                key, (cfg.num_envs, sum(cfg.action_dim_n)), jnp.float32,
                -1.0, 1.0)

        self._random_actions = jax.jit(random_actions)

        if cfg.rl_algo in ("TD3", "SAC"):
            def insert(rs, tr):
                return replay_lib.insert_rollout(rs, tr)

            self._insert = jax.jit(insert)

            def updates(states, rs, key, n_updates):
                def body(carry, k):
                    states = carry
                    ks, ku = jax.random.split(k)
                    b = replay_lib.sample(rs, ks, cfg.batch_size)
                    states, metrics = self.train_fn(cfg, agents, states, b,
                                                    ku)
                    return states, metrics

                keys = jax.random.split(key, n_updates)
                # list pytree works as scan carry
                states, metrics = jax.lax.scan(body, states, keys)
                return states, jax.tree.map(lambda m: m[-1], metrics)

            self._updates = {}
            for nu in (1, 2, 4, 8, 16, 32):
                self._updates[nu] = jax.jit(partial(updates, n_updates=nu))
        else:
            self._ppo_train = jax.jit(
                lambda st, d, k: self.train_fn(cfg, agents, st, d, k))

        # ---- batched eval rollout (reference eval_policy, main.py:270-404)
        eval_cfg = cfg.replace(num_envs=cfg.num_eval)
        eval_steps = int(round(cfg.eval_max_steps / DT))

        def eval_rollout(states, key):
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
                if cfg.save_log:
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

        self._eval = jax.jit(eval_rollout)

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
        rewards = np.asarray(rewards)
        print(
            f"total_timesteps: {self.total_timesteps} \t eval_reward: "
            f"{[round(float(r), 4) for r in rewards]} \t benchmark_reward: "
            f"{float(bench):.4f}")
        return rewards, float(bench), np.asarray(success)

    # ------------------------------------------------------------------
    def train_policy(self):
        cfg = self.cfg
        tl = logs.TextLogs(self.results_dir, cfg.seed)
        thr = logs.Throughput()
        max_total_reward = [0.85 * cfg.eval_max_steps / DT] * cfg.n_agents
        eval_steps = int(round(cfg.eval_max_steps / DT))

        n_updates = max(int(round(cfg.updates_per_step)), 1)
        n_updates = min(
            (u for u in (1, 2, 4, 8, 16, 32) if u >= n_updates), default=32)

        ppo_horizon = []
        next_eval = cfg.eval_freq
        if cfg.eval_freq < cfg.num_envs:
            print(f"note: eval_freq ({cfg.eval_freq}) < num_envs "
                  f"({cfg.num_envs}); evaluating once per tick — raise "
                  f"--eval_freq for throughput")
        last_report = time.perf_counter()
        next_ckpt = (self.total_timesteps + cfg.checkpoint_freq
                     if cfg.checkpoint_freq else None)
        # per-env episodic return accumulators (reference logs per-episode
        # rewards to log_step, main.py:218-223)
        ep_ret = np.zeros((cfg.num_envs, cfg.n_agents), np.float64)

        while self.total_timesteps < cfg.max_timesteps:
            self.key, k1, k2, k3 = jax.random.split(self.key, 4)
            warm = (cfg.rl_algo == "PPO"
                    or self.total_timesteps >= cfg.start_timesteps)
            if cfg.rl_algo != "PPO" and not warm:
                action = self._random_actions(k1)
                per_agent_acts = self._split_action(action)
                logps = None
            else:
                action, per_agent_acts, logps = self._act_train(
                    self.states, self.obs,
                    jnp.asarray(self.explor_noise_std, jnp.float32), k1)

            prev_obs = self.obs
            self.bstate, out = self._env_step(self.bstate, action)
            self.obs = out.obs
            self.total_timesteps += cfg.num_envs
            thr.add(env_steps=cfg.num_envs)

            if cfg.rl_algo in ("TD3", "SAC"):
                tr = batch_lib.Transition(
                    obs=prev_obs, action=action, reward=out.reward,
                    next_obs=out.info["terminal_obs"], done=out.done)
                # add time axis of 1 for insert_rollout
                tr = jax.tree.map(lambda x: x[None], tr)
                self.replay = self._insert(self.replay, tr)
                if warm:
                    self.states, metrics = self._updates[n_updates](
                        self.states, self.replay, k2)
                    thr.add(updates=n_updates)
            else:
                ppo_horizon.append(
                    (prev_obs, per_agent_acts, out.reward,
                     out.info["terminal_obs"], out.done, logps))
                if len(ppo_horizon) * cfg.num_envs >= cfg.T_horizon:
                    data = self._stack_horizon(ppo_horizon)
                    self.states, metrics = self._ppo_train(
                        self.states, data, k3)
                    ppo_horizon = []

            # episodic-return logging at episode boundaries
            ep_ret += np.asarray(out.reward, np.float64)
            resets = np.asarray(out.reset_happened)
            if resets.any() and self.total_timesteps >= cfg.start_timesteps:
                finished = ep_ret[resets]
                tl.log_step(self.total_timesteps,
                            [round(float(r), 4) for r in finished.mean(0)])
            ep_ret[resets] = 0.0

            if cfg.rl_algo == "TD3" and cfg.use_explor_noise_decay:
                self.explor_noise_std = max(
                    self.explor_noise_std - self.noise_std_decay * cfg.num_envs,
                    cfg.explor_noise_std_min)

            # periodic eval (reference main.py:242-264)
            if self.total_timesteps >= next_eval and (
                    cfg.rl_algo == "PPO" or warm):
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

    # ------------------------------------------------------------------
    def train_policy_sharded(self, rollout_len: int = 50):
        """Multi-device training: the whole rollout+replay+update superstep
        runs as one shard_map program over an ``env`` mesh axis spanning all
        devices (SURVEY.md §7.6).  Used automatically by main() when more
        than one device is visible and the algo is off-policy."""
        from gym_rotor_tpu.algos import sac as sac_lib
        from gym_rotor_tpu.parallel import mesh as mesh_lib
        from gym_rotor_tpu.parallel.train_step import (
            make_sharded_td3_superstep, sharded_init)

        cfg = self.cfg
        assert cfg.rl_algo in ("TD3", "SAC"), "sharded path is off-policy"
        mesh = mesh_lib.make_mesh()
        n_dev = mesh.devices.size
        print(f"sharded training over {n_dev} devices, "
              f"{cfg.num_envs} envs, rollout_len={rollout_len}")
        self.states = [jax.device_put(s, mesh_lib.replicated(mesh))
                       for s in self.states]
        self.key, ek = jax.random.split(self.key)
        bstate, obs, rstate = sharded_init(cfg, mesh, ek)

        n_updates = max(int(round(cfg.updates_per_step)), 1)
        act_fn = None
        train_fn = None
        if cfg.rl_algo == "SAC":
            train_fn = sac_lib.train_step

            def act_fn(states, ob, noise_std, k):
                acts = []
                for i, a in enumerate(self.agents):
                    k, sub = jax.random.split(k)
                    acts.append(a.choose_action(states[i], ob[i], sub))
                return jnp.concatenate(acts, axis=-1)

        step = make_sharded_td3_superstep(
            cfg, self.agents, mesh, rollout_len=rollout_len,
            n_updates=n_updates, train_fn=train_fn, act_fn=act_fn)

        tl = logs.TextLogs(self.results_dir, cfg.seed)
        thr = logs.Throughput()
        next_eval = cfg.eval_freq
        last_report = time.perf_counter()
        steps_per_call = cfg.num_envs * rollout_len
        while self.total_timesteps < cfg.max_timesteps:
            self.key, sub = jax.random.split(self.key)
            bstate, obs, rstate, self.states, metrics = step(
                bstate, obs, rstate, self.states, sub,
                self.explor_noise_std)
            self.total_timesteps += steps_per_call
            thr.add(env_steps=steps_per_call, updates=n_updates)
            if cfg.rl_algo == "TD3" and cfg.use_explor_noise_decay:
                self.explor_noise_std = max(
                    self.explor_noise_std
                    - self.noise_std_decay * steps_per_call,
                    cfg.explor_noise_std_min)
            if self.total_timesteps >= next_eval:
                rewards, bench, success = self.eval_policy()
                tl.log_eval(self.total_timesteps, bench, list(rewards))
                while next_eval <= self.total_timesteps:
                    next_eval += cfg.eval_freq
            if time.perf_counter() - last_report > 10.0:
                es, us = thr.rates()
                print(f"t={self.total_timesteps}  env-steps/s={es:,.0f}  "
                      f"updates/s={us:,.1f}")
                last_report = time.perf_counter()
        tl.close()

    # ------------------------------------------------------------------
    def _split_action(self, action):
        outs, off = [], 0
        for d in self.cfg.action_dim_n:
            outs.append(action[..., off:off + d])
            off += d
        return tuple(outs)

    def _stack_horizon(self, rows):
        n = self.cfg.n_agents
        obs = tuple(jnp.stack([r[0][i] for r in rows]) for i in range(n))
        act = tuple(jnp.stack([r[1][i] for r in rows]) for i in range(n))
        rwd = tuple(jnp.stack([r[2][..., i] for r in rows])[..., None]
                    for i in range(n))
        nxt = tuple(jnp.stack([r[3][i] for r in rows]) for i in range(n))
        done = tuple(jnp.stack([r[4][..., i] for r in rows])[..., None]
                     .astype(jnp.float32) for i in range(n))
        logp = tuple(jnp.stack([r[5][i] for r in rows]) for i in range(n))
        return ppo_lib.Horizon(obs=obs, act=act, rwd=rwd, next_obs=nxt,
                               done=done, logprob=logp)


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
        if ((len(jax.devices()) > 1 or cfg.use_superstep)
                and cfg.rl_algo in ("TD3", "SAC")):
            learner.train_policy_sharded()
        else:
            learner.train_policy()


if __name__ == "__main__":
    main()
