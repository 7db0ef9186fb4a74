"""Decisive probe of jax.block_until_ready semantics through the axon
tunnel: one program returns an output produced EARLY in execution (sum of
the input) and one produced LATE (after a long fori_loop of matmuls).  If
blocking on the early output returns before the program finishes, per-
output readiness is streamed and every benchmark must block on the most-
downstream output (learner states), not on rollout-phase metrics."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


@jax.jit
def f(x):
    early = x.sum()

    def body(i, c):
        return jnp.tanh(c @ c + x)

    late = jax.lax.fori_loop(0, 4000, body, x)
    return early, late


x = jnp.eye(1024) * 0.5
# compile + settle
e, l = f(x)
jax.block_until_ready(l)

t0 = time.perf_counter()
e, l = f(x)
jax.block_until_ready(e)
t_early = time.perf_counter() - t0
t0 = time.perf_counter()
jax.block_until_ready(l)
t_late_after = time.perf_counter() - t0

t0 = time.perf_counter()
e, l = f(x)
jax.block_until_ready(l)
t_late = time.perf_counter() - t0

print(f"block(early)={t_early*1e3:.1f} ms, then block(late) adds "
      f"{t_late_after*1e3:.1f} ms; block(late) directly={t_late*1e3:.1f} ms")

# ground truth: an actual device->host transfer of the heavy output
import numpy as np

t0 = time.perf_counter()
e, l = f(x)
v = float(l.sum())
t_xfer = time.perf_counter() - t0
print(f"float(late.sum()) barrier={t_xfer*1e3:.1f} ms (the ~8.6 TFLOP "
      f"fori_loop cannot run faster than ~100 ms on one v5e)")
if t_late < 0.5 * t_xfer:
    print("VERDICT: block_until_ready does NOT wait on this backend — "
          "benches must barrier via a host transfer of a most-downstream "
          "output")
else:
    print("VERDICT: block_until_ready waits correctly")
