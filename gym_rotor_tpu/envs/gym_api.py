"""Classful gymnasium-compatible API over the functional core.

Drop-in surface for users of the reference package: ``QuadEnv``
(reference gym_rotor/envs/quad.py:19-758), ``CoupledWrapper`` and
``DecoupledWrapper`` (reference wrappers) with the same public attributes and
methods (step/reset/render/close, get_current_state, set_goal_state,
get_norm_error_state, x_lim/v_lim/W_lim/dt/hover_force/... —
SURVEY.md §1 L1 public interface).

Episode initialization draws from the *NumPy* global RNG in the reference's
exact order (via the oracle), so ``utils.seeding.set_seed`` + ``reset`` gives
fixed-seed parity with the reference; the dynamics run through the jitted
functional step.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import Config
from . import oracle as onp
from . import quad as fquad
from . import state_from_oracle
from .quad import DT, EIB1_LIM, EIX_LIM, V_LIM, W_LIM, X_LIM
from .state import pack_state

try:
    import gymnasium as gym
    from gymnasium import spaces

    _BASE = gym.Env
except Exception:  # pragma: no cover
    gym = None
    spaces = None
    _BASE = object


class QuadEnv(_BASE):
    """Base Quad-v0: per-motor thrust actions, 18-dim state observation."""

    metadata = {"render_modes": ["human"]}

    task = "quad"

    def __init__(self, cfg: Optional[Config] = None, render_mode=None,
                 max_episode_steps: int = 10000, dtype=jnp.float64):
        if cfg is None:
            # reference default is the adaptive DOP853 solver for the base
            # env and the wrappers alike (quad.py:62, coupled:62-64); pass a
            # Config with integrator='euler' for the parity configuration
            # (quad.py:252-262)
            cfg = Config(framework="MONO", integrator="dop853")
        self.cfg = cfg.replace(exact_so3=True)
        self.dtype = dtype
        self.max_episode_steps = max_episode_steps
        self.render_mode = render_mode
        self._renderer = None

        # Reference-compatible public constants (quad.py:28-64,104-107)
        self.freq = 200
        self.dt = DT
        self.x_lim, self.v_lim, self.W_lim = X_LIM, V_LIM, float(W_LIM)
        self.eIx_lim, self.eIb1_lim = EIX_LIM, EIB1_LIM
        self.e1 = np.array([1.0, 0.0, 0.0])
        self.e2 = np.array([0.0, 1.0, 0.0])
        self.e3 = np.array([0.0, 0.0, 1.0])
        self.g = 9.81

        self._oracle = onp.OracleEnv(self.cfg, self.task)
        self._sync_params()
        self._jit_step = jax.jit(
            lambda s, a: fquad.step(self.cfg, s, a, self.task))
        self._state = None

        if spaces is not None:
            low = np.concatenate([
                -self.x_lim * np.ones(3), -self.v_lim * np.ones(3),
                -np.ones(9), -self.W_lim * np.ones(3)]).astype(np.float32)
            self.observation_space = spaces.Box(low=low, high=-low,
                                                dtype=np.float32)
            self.action_space = spaces.Box(
                low=-1.0, high=1.0, shape=(self._action_dim(),),
                dtype=np.float32)

    def _action_dim(self):
        return {"quad": 4, "coupled": 4, "decoupled": 5}[self.task]

    def _sync_params(self):
        p = self._oracle.p
        self.m, self.d, self.J = p.m, p.d, np.diag(p.J)
        self.c_tf, self.c_tw = p.c_tf, p.c_tw
        self.hover_force = p.hover_force
        self.min_force, self.max_force = p.min_force, p.max_force
        self.avrg_act, self.scale_act = p.avrg_act, p.scale_act
        self.forces_to_fM = p.forces_to_fM
        self.fM_to_forces = p.fM_to_forces

    # ------------------------------------------------------------------
    def reset(self, env_type: str = "train", seed: Optional[int] = None,
              options=None):
        if seed is not None and gym is not None:
            super().reset(seed=seed)
        self._oracle.reset(env_type)
        self._sync_params()
        self._state = state_from_oracle(self.cfg, self._oracle, self.dtype)
        self._t = 0
        return np.asarray(self.state, dtype=np.float32)

    @property
    def state(self):
        s = self._state
        return np.asarray(
            pack_state(s.x, s.v, s.R, s.W), dtype=np.float64)

    def get_current_state(self):
        return self.state

    def set_goal_state(self, xd, vd, b1d, b1d_dot, Wd):
        self._state = fquad.set_goal(
            self._state,
            jnp.asarray(xd, self.dtype), jnp.asarray(vd, self.dtype),
            jnp.asarray(b1d, self.dtype), jnp.asarray(b1d_dot, self.dtype),
            jnp.asarray(Wd, self.dtype))

    def get_norm_error_state(self, framework=None):
        """Normalized error observation + integral update (quad.py:421-466).

        Matches the reference call pattern: the driver invokes this once
        right after reset (the wrappers' step path computes it internally)."""
        cfg = self.cfg.replace(framework=framework or self.cfg.framework)
        self._state, obs = fquad.initial_obs(cfg, self._state)
        if cfg.framework == "MODUL":
            return [np.asarray(obs[0]), np.asarray(obs[1])]
        return [np.asarray(obs)]

    def step(self, action):
        action = jnp.asarray(np.asarray(action, np.float64), self.dtype)
        self._state, out = self._jit_step(self._state, action)
        self._t += 1
        if self.task == "decoupled":
            obs = [np.asarray(out.obs[0]), np.asarray(out.obs[1])]
        elif self.task == "coupled":
            obs = [np.asarray(out.obs)]
        else:
            obs = np.asarray(out.obs, np.float32)
        reward = list(np.asarray(out.reward, np.float64))
        done = list(np.asarray(out.done))
        truncated = self._t >= self.max_episode_steps
        if self.task == "quad":
            return obs, reward[0], bool(done[0]), truncated, {}
        return obs, reward, done, truncated, {}

    def render(self, mode="human"):
        from ..render.renderer import Renderer

        if self._renderer is None:
            self._renderer = Renderer()
        s = self._state
        self._renderer.draw(
            np.asarray(s.x), np.asarray(s.R), np.asarray(s.goal.xd),
            np.asarray(s.goal.b1d))
        return True

    def close(self):
        if self._renderer is not None:
            self._renderer.close()
            self._renderer = None


class CoupledWrapper(QuadEnv):
    """MONO task (reference coupled_yaw_wrapper.py:11-110)."""

    task = "coupled"

    def __init__(self, cfg: Optional[Config] = None, **kw):
        cfg = (cfg or Config(integrator="dop853")).replace(framework="MONO")
        super().__init__(cfg, **kw)
        self.alpha, self.beta = self.cfg.alpha, self.cfg.beta


class DecoupledWrapper(QuadEnv):
    """MODUL two-agent task (reference decoupled_yaw_wrapper.py:12-161)."""

    task = "decoupled"

    def __init__(self, cfg: Optional[Config] = None, **kw):
        cfg = (cfg or Config(integrator="dop853")).replace(framework="MODUL")
        super().__init__(cfg, **kw)
        self.alpha, self.beta = self.cfg.alpha, self.cfg.beta
