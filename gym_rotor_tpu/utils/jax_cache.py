"""Persistent XLA compilation cache.

The axon TPU backend compiles server-side: a flagship bench/probe compile
costs 5-15 minutes of wall clock per fresh process, repays nothing across
processes, and a killed-mid-compile process can wedge the remote service
(.claude/skills/verify/SKILL.md).  JAX's persistent compilation cache works
through the tunnel (measured: a 45 s remote compile replays in 0.7 s from a
fresh process), keyed on the optimized HLO + compile options + runtime
version, so it is safe across code changes — any change that alters the
compiled program misses the cache and recompiles.

Call ``enable_compile_cache()`` at entrypoint start (bench.py,
bench_train.py, train.py, scripts/*probe*).  Opt out with
GYM_ROTOR_NO_COMPILE_CACHE=1 (e.g. when benchmarking compile time itself).
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "gym_rotor_tpu", "xla")


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing).  Returns the directory, or None when disabled by env."""
    if os.environ.get("GYM_ROTOR_NO_COMPILE_CACHE"):
        return None
    import jax

    path = path or os.environ.get("GYM_ROTOR_COMPILE_CACHE", DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything: the env/learner programs worth caching are exactly
    # the long-compiling ones, and tiny entries cost nothing
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return path
