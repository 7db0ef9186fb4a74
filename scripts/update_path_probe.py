"""Component-wise timing of the off-policy learner update (VERDICT r3 #2).

Times a jitted chain of K flagship TD3 updates (no rollout, fixed synthetic
batch regenerated per iteration from the carry key) under several ablations,
using the two-point slope method (bench.py) so the axon-tunnel RTT cancels:

  full          — the exact train_step the superstep scans
  fold          — cfg.equiv_fold on (fold per loss, fast-twin forwards)
  no_spectral   — spectral-norm regularizers removed
  no_caps       — CAPS smoothness terms removed
  freq1         — policy_update_freq=1 (actor every update; cond always taken)
  critic_only   — policy_update_freq=2**30 (actor branch never taken)
  mlp           — MONO MLP twin for scale

Also prints the compiled-HLO instruction histogram (top opcodes) for the
full variant, which is the evidence for what the 11 ms/update actually is.

Usage: python scripts/update_path_probe.py [--k 128] [--batch 4096]
       [--variants full,no_spectral,...] [--hlo]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import Counter
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_rotor_tpu.utils.jax_cache import enable_compile_cache

enable_compile_cache()

from gym_rotor_tpu.algos import td3 as td3_lib
from gym_rotor_tpu.models import td3_models
from gym_rotor_tpu.utils.config import Config


def make_batch(cfg, key):
    ks = jax.random.split(key, 5)
    B = cfg.batch_size
    def per(dims, k):
        return tuple(jax.random.normal(jax.random.fold_in(k, i), (B, d))
                     for i, d in enumerate(dims))
    n = cfg.n_agents
    from gym_rotor_tpu.algos.replay import Batch
    return Batch(
        obs=per(cfg.obs_dim_n, ks[0]),
        act=per(cfg.action_dim_n, ks[1]),
        rwd=per([1] * n, ks[2]),
        next_obs=per(cfg.obs_dim_n, ks[3]),
        done=tuple(jnp.zeros((B, 1)) for _ in range(n)),
    )


def _solo_spectral(weights, key, extras=(), iters=10):
    """The pre-batching per-matrix spectral regularizer (probe ablation)."""
    import jax.numpy as jnp
    from gym_rotor_tpu.algos.regularizers import approx_spectral_norm
    total = 0.0
    for i, W in enumerate(weights):
        total = total + approx_spectral_norm(
            W, jax.random.fold_in(key, i), iters) ** 2
    for e in extras:
        total = total + jnp.sum(e * e)
    return total


def build(cfg, strip_spectral=False, strip_caps=False, strip_stack=False,
          solo_spectral=False, fixed_batch=False, sgd=False):
    if sgd:
        import optax
        orig_opt = td3_lib.make_optimizer
        td3_lib.make_optimizer = lambda cfg, lr: optax.sgd(lr)
        build.restore_o = lambda: setattr(
            td3_lib, "make_optimizer", orig_opt)
    agents = [td3_lib.TD3Agent(cfg, i, td3_models(cfg, i))
              for i in range(cfg.n_agents)]
    if sgd:
        build.restore_o()
        build.restore_o = None
    if strip_stack:
        for a in agents:
            a.defs = a.defs._replace(critic_split=None)
    if solo_spectral:
        from gym_rotor_tpu.algos import regularizers
        orig_s = regularizers.spectral_norm_regularization
        regularizers.spectral_norm_regularization = _solo_spectral
        build.restore_s = lambda: setattr(
            regularizers, "spectral_norm_regularization", orig_s)
    if strip_spectral:
        for a in agents:
            a.defs = a.defs._replace(actor_spectral=None, critic_spectral=None)
    if strip_caps:
        from gym_rotor_tpu.algos import regularizers
        orig = regularizers.caps_regularization
        regularizers.caps_regularization = \
            lambda *a, **k: jnp.zeros(())
        build.restore = lambda: setattr(
            regularizers, "caps_regularization", orig)
    states = [a.init(jax.random.PRNGKey(i)) for i, a in enumerate(agents)]

    batch0 = make_batch(cfg, jax.random.PRNGKey(99)) if fixed_batch else None

    @partial(jax.jit, static_argnums=(2,))
    def chain(states, key, k):
        def body(carry, i):
            states, key = carry
            key, kb, ku = jax.random.split(key, 3)
            batch = batch0 if fixed_batch else make_batch(cfg, kb)
            states, m = td3_lib.train_step(cfg, agents, states, batch, ku)
            return (states, key), m["agent0/critic_loss"]
        (states, _), losses = jax.lax.scan(
            body, (states, key), jnp.arange(k))
        return states, losses[-1]

    return agents, states, chain


def fence(states, loss):
    s = float(loss)
    s += float(jnp.sum(jax.tree.leaves(states[0].actor)[0]))
    return s


def time_variant(name, cfg, k, hlo=False, **strip):
    agents, states, chain = build(cfg, **strip)
    key = jax.random.PRNGKey(7)
    # compile both trip counts
    s1, l1 = chain(states, key, 4)
    fence(s1, l1)
    sk, lk = chain(states, key, 4 + k)
    fence(sk, lk)
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        s1, l1 = chain(states, key, 4)
        fence(s1, l1)
        t1 = time.perf_counter()
        sk, lk = chain(states, key, 4 + k)
        fence(sk, lk)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / k)
    out = {"variant": name, "ms_per_update": best * 1e3,
           "updates_per_sec": 1.0 / best}
    if hlo:
        compiled = chain.lower(states, key, 4 + k).compile()
        hlo_text = compiled.as_text()
        ops = Counter()
        for line in hlo_text.splitlines():
            line = line.strip()
            if "=" in line and not line.startswith(("HloModule", "ENTRY", "//",
                                                    "}", "{")):
                rhs = line.split("=", 1)[1].strip()
                # tokens: <shape> <opcode>(...) — skip the shape token
                toks = rhs.split(" ")
                if len(toks) >= 2:
                    ops[toks[1].split("(")[0]] += 1
        out["hlo_total"] = sum(ops.values())
        out["hlo_top"] = ops.most_common(15)
    if getattr(build, "restore", None):
        build.restore()
        build.restore = None
    if getattr(build, "restore_s", None):
        build.restore_s()
        build.restore_s = None
    if getattr(build, "restore_o", None):
        build.restore_o()
        build.restore_o = None
    print(json.dumps(out))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=128)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--variants", default="full,fold,no_spectral,no_caps,"
                   "freq1,critic_only,mlp")
    p.add_argument("--hlo", action="store_true")
    args = p.parse_args()

    base = dict(rl_algo="TD3", num_envs=args.batch, batch_size=args.batch,
                replay_buffer_size=10_000, max_steps=4000)
    emlp = dict(framework="MODUL", module_training="DTDE", use_equiv=True,
                **base)

    variants = {
        "full": (Config(**emlp), {}),
        "fixed_batch": (Config(**emlp), dict(fixed_batch=True)),
        "sgd": (Config(**emlp), dict(sgd=True)),
        "fixed_sgd": (Config(**emlp), dict(fixed_batch=True, sgd=True)),
        "no_stack": (Config(**emlp), dict(strip_stack=True)),
        "solo_spectral": (Config(**emlp), dict(solo_spectral=True)),
        "no_stack_solo": (Config(**emlp),
                          dict(strip_stack=True, solo_spectral=True)),
        "fold": (Config(equiv_fold=True, **emlp), {}),
        "no_spectral": (Config(**emlp), dict(strip_spectral=True)),
        "no_caps": (Config(**emlp), dict(strip_caps=True)),
        "freq1": (Config(policy_update_freq=1, **emlp), {}),
        "critic_only": (Config(policy_update_freq=2**30, **emlp), {}),
        "mlp": (Config(framework="MONO", use_equiv=False, **base), {}),
    }
    for name in args.variants.split(","):
        cfg, strip = variants[name]
        time_variant(name, cfg, args.k, hlo=args.hlo and name == "full",
                     **strip)


if __name__ == "__main__":
    main()
