"""Pin the chip's serial op-issue floor (us per dispatched kernel).

The flagship EMLP learner update compiles to ~1.9k fused kernels + small
dots whose per-kernel runtime is dominated by fixed issue cost, not FLOPs
(docs/DESIGN.md §4).  This probe measures that fixed cost directly, the
same way the update runs: a `lax.scan` whose body is a chain of M
*mutually non-fusable* tiny ops —

  dot   : M dependent (4096,64)@(64,64) dot_generals, each separated by a
          full max-reduction (a dot cannot fuse into a dot; the reduction
          cannot fuse into either side's accumulator) => ~2M kernels/iter
  vpu   : M (tanh -> full-sum -> broadcast-add) rounds => ~2M kernels/iter
          (the reduction breaks the elementwise chain each round)

Two scan lengths K1 < K2 give a slope per iteration with compile, RTT and
prologue cancelled; dividing by kernels/iter yields us/kernel.  FLOPs and
bytes per kernel are chosen to be negligible (a 33 MFLOP dot is ~0.2 us of
MXU; a 1 MB activation is ~1 us of HBM), so the slope is the issue floor
plus HBM latency of ~1 MB tiles — exactly the regime the EMLP update's
kernels occupy.

Prints one JSON line per variant.
Usage: python scripts/dispatch_floor_probe.py [--batch 4096] [--width 64]
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

from gym_rotor_tpu.utils.jax_cache import enable_compile_cache

enable_compile_cache()

M = 16  # non-fusable ops per scan iteration (x2 kernels: op + reduction)


def build(variant, k, batch, width):
    w = jnp.eye(width, dtype=jnp.float32) * 0.99

    if variant == "dot":
        def body(x, _):
            for _i in range(M):
                x = x @ w
                x = x / (1.0 + jnp.max(jnp.abs(x)))
            return x, None
    else:
        def body(x, _):
            for _i in range(M):
                x = jnp.tanh(x)
                x = x + jnp.sum(x) * 1e-12
            return x, None

    @jax.jit
    def chain(x):
        x, _ = jax.lax.scan(body, x, None, length=k)
        return x
    return chain


def run(variant, batch, width, k1=32, k2=256):
    x = jnp.ones((batch, width), jnp.float32) * 0.1
    c1 = build(variant, k1, batch, width)
    c2 = build(variant, k2, batch, width)
    float(jnp.sum(c1(x)))
    float(jnp.sum(c2(x)))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(jnp.sum(c1(x)))
        t1 = time.perf_counter()
        float(jnp.sum(c2(x)))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    print(json.dumps({"probe": "dispatch_floor", "variant": variant,
                      "us_per_kernel": best * 1e6 / (2 * M),
                      "kernels_per_iter": 2 * M,
                      "batch": batch, "width": width,
                      "scan_lengths": [k1, k2]}))
    sys.stdout.flush()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--variants", default="vpu,dot")
    args = p.parse_args()
    for v in args.variants.split(","):
        run(v, args.batch, args.width)


if __name__ == "__main__":
    main()
