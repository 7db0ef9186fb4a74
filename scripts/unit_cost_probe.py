"""Per-network unit costs of the flagship update's building blocks.

Times a jitted scan of K iterations of ONE building block at batch 4096
(slope method, chained through a carry so nothing is dead-code-eliminated):

  a0_critic_fwd   — agent-0 (SO2eR3 tower) twin-critic forward
  a1_critic_fwd   — agent-1 (Mirror tower) twin-critic forward
  a0_critic_grad  — value_and_grad of an MSE loss through agent-0's twin
  a1_critic_grad  — same for agent-1
  a0_actor_fwd    — agent-0 actor forward
  opt_only        — clip_by_global_norm + AdamW update on agent-0's critic
                    tree with a synthetic gradient

Usage: python scripts/unit_cost_probe.py [--k 256] [--batch 4096]
       [--variants ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.models import td3_models
from gym_rotor_tpu.utils.config import Config


def fence(x):
    return float(jnp.sum(x))


def timeit(name, chain, *args):
    s = chain(*args, 4)
    fence(s)
    s = chain(*args, 260)
    fence(s)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fence(chain(*args, 4))
        t1 = time.perf_counter()
        fence(chain(*args, 260))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 256)
    print(json.dumps({"variant": name, "us_per_iter": best * 1e6}))
    sys.stdout.flush()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--variants", default="a0_critic_fwd,a1_critic_fwd,"
                   "a0_critic_grad,a1_critic_grad,a0_actor_fwd,opt_only")
    args = p.parse_args()

    cfg = Config(framework="MODUL", module_training="DTDE", use_equiv=True,
                 rl_algo="TD3", num_envs=args.batch, batch_size=args.batch,
                 replay_buffer_size=10_000, max_steps=4000)
    agents = [td3_lib.TD3Agent(cfg, i, td3_models(cfg, i)) for i in range(2)]
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]
    B = args.batch

    def scan_chain(fn, carry_init):
        from functools import partial

        @partial(jax.jit, static_argnums=(1,))
        def chain(carry, k):
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, carry, None, length=k)
            return jax.tree.leaves(out)[0].sum()
        return chain, carry_init

    variants = {}
    for aid in (0, 1):
        a = agents[aid]
        od, ad = cfg.obs_dim_n[aid], cfg.action_dim_n[aid]
        cp = states[aid].critic

        def fwd(x, a=a, cp=cp, od=od, ad=ad):
            q1, q2 = a.defs.critic_def.apply(cp, x[:, :od], x[:, od:od + ad])
            # fold the outputs back into the carry so the scan cannot DCE
            return x + 1e-9 * (q1 + q2)

        variants[f"a{aid}_critic_fwd"] = scan_chain(
            fwd, jnp.ones((B, od + ad)) * 0.1)

        def grad_step(x, a=a, cp=cp, od=od, ad=ad):
            def loss(p):
                q1, q2 = a.defs.critic_def.apply(p, x[:, :od],
                                                 x[:, od:od + ad])
                return ((q1 - 1.0) ** 2 + (q2 - 1.0) ** 2).mean()
            g = jax.grad(loss)(cp)
            return x + 1e-9 * jax.tree.leaves(g)[0].mean()

        variants[f"a{aid}_critic_grad"] = scan_chain(
            grad_step, jnp.ones((B, od + ad)) * 0.1)

    def actor_fwd(x):
        y = agents[0].defs.actor_def.apply(states[0].actor, x)
        return x + 1e-9 * y.sum(-1, keepdims=True)

    variants["a0_actor_fwd"] = scan_chain(
        actor_fwd, jnp.ones((B, cfg.obs_dim_n[0])) * 0.1)

    tx = agents[0].critic_tx
    opt0 = tx.init(states[0].critic)

    def opt_step(carry):
        params, opt = carry
        g = jax.tree.map(lambda p: p * 1e-6, params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt

    variants["opt_only"] = scan_chain(opt_step, (states[0].critic, opt0))

    for name in args.variants.split(","):
        chain, init = variants[name]
        timeit(name, chain, init)


if __name__ == "__main__":
    main()
