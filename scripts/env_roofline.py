"""Roofline arithmetic for the env engine (VERDICT r4 #6).

Compiles ONE batched tick (envs.batch.batched_step, the scan body bench.py
measures) and pulls XLA's ``cost_analysis`` for it: f32 flops,
transcendentals and bytes-accessed per env-tick.  Combined with the
measured steps/s from docs/bench/env_<N>.json this yields achieved FLOP/s
and state traffic — i.e. where the throughput ceiling sits relative to the
chip's compute and bandwidth roofs (conclusion in docs/DESIGN.md §1).

Notes on methodology:
* the analysis is taken from the CPU lowering of the identical HLO — the
  axon backend reports no cost table, and analyzing the whole rollout scan
  counts its while-body only once, so the per-tick program is the unit;
* ``bytes accessed`` is XLA's pre-fusion estimate (every op's operands +
  results); the post-fusion HBM floor is the env state + obs round trip,
  reported separately from the pytree sizes;
* with the sparse auto-reset both cond branches are counted by the static
  analysis; the executed sparse path is roughly half the listed flops.

Usage: python scripts/env_roofline.py [--num_envs 4096]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from gym_rotor_tpu.envs import batch as batch_lib
from gym_rotor_tpu.utils.config import Config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=4096)
    args = p.parse_args()
    n = args.num_envs

    cfg = Config(framework="MONO", integrator="rk4", num_envs=n,
                 max_steps=4000)
    bstate, obs = batch_lib.batched_reset(cfg, jax.random.PRNGKey(0))
    actions = jnp.zeros((n, 4), jnp.float32)

    compiled = jax.jit(
        lambda b: batch_lib.batched_step(cfg, b, actions)).lower(
            bstate).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    trans = float(ca.get("transcendentals", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    state_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(bstate)) / n
    obs_bytes = sum(x.size * x.dtype.itemsize
                    for x in jax.tree.leaves(obs)) / n

    out = {
        "num_envs": n,
        "flops_per_env_tick": flops / n,
        "transcendentals_per_env_tick": trans / n,
        "prefusion_bytes_per_env_tick": bytes_acc / n,
        "state_bytes_per_env": state_bytes,
        "obs_bytes_per_env": obs_bytes,
    }
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "bench", f"env_{n}.json")
    if os.path.exists(art):
        with open(art) as f:
            rate = json.load(f)["value"]
        out["measured_steps_per_sec"] = rate
        out["achieved_gflops_per_sec"] = rate * flops / n / 1e9
        out["state_roundtrip_gbytes_per_sec"] = (
            rate * 2 * (state_bytes + obs_bytes) / 1e9)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
