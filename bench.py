"""Throughput benchmark: batched env engine steps/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is aggregate env-steps/s at cfg.num_envs lockstep envs (MONO task,
RK4 integrator, trajectory generation + auto-reset compiled in, random
policy).  vs_baseline is measured against BASELINE.md's 10M env-steps/s
target (the reference itself is a single-env CPU loop at ~1e3-1e4 steps/s and
publishes no throughput numbers — see BASELINE.md).
"""
import argparse
import json
import subprocess
import sys
import time

TARGET = 1e7  # env-steps/s north star (BASELINE.json)

# Minimal compile probe, run in a SUBPROCESS so a wedged remote-compile
# service (see .claude/skills/verify/SKILL.md: the axon backend occasionally
# blocks a fresh process's first compile indefinitely, fully server-side)
# hangs a killable child instead of this process.  The probe is tiny, so a
# healthy backend clears it in well under the timeout even on first compile.
_PROBE = (
    "import os, jax, jax.numpy as jnp;"
    # the axon plugin overrides JAX_PLATFORMS, so an explicit platform
    # (used by tests to force cpu) must go through jax.config post-import
    "p = os.environ.get('GYM_ROTOR_PROBE_PLATFORM');"
    "p and jax.config.update('jax_platforms', p);"
    "x = jax.jit(lambda a: a @ a)(jnp.ones((128, 128)));"
    "jax.block_until_ready(x); print('probe-ok')"
)


def _probe_backend(attempts=4, timeout_s=180.0, backoff_s=45.0):
    """Return None if a tiny jit compile succeeds, else an error string."""
    last = "unknown"
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if r.returncode == 0 and "probe-ok" in r.stdout:
                return None
            last = (r.stderr.strip().splitlines() or ["rc=%d" % r.returncode])[-1]
        except subprocess.TimeoutExpired:
            last = "probe compile timed out after %.0fs" % timeout_s
        if i + 1 < attempts:
            print("bench: probe attempt %d/%d failed (%s); backing off %.0fs"
                  % (i + 1, attempts, last, backoff_s), file=sys.stderr)
            time.sleep(backoff_s)
    return last


def _emit_error(err):
    """Protocol-conformant failure line: parseable, flags the error."""
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": 0.0,
        "unit": "steps/s",
        "vs_baseline": 0.0,
        "error": str(err)[:500],
    }))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096,
                    help="lockstep env batch (4096 = the BASELINE point)")
    ap.add_argument("--skip_probe", action="store_true",
                    help="skip the subprocess compile probe (tests)")
    args = ap.parse_args(argv)

    if not args.skip_probe:
        err = _probe_backend()
        if err is not None:
            _emit_error("backend probe failed: " + err)
            return

    try:
        _run_bench(args)
    except Exception as e:  # noqa: BLE001 — protocol demands one JSON line
        _emit_error("%s: %s" % (type(e).__name__, e))


def _run_bench(args):
    import jax
    import jax.numpy as jnp

    from gym_rotor_tpu.envs import batch
    from gym_rotor_tpu.utils.config import Config
    from gym_rotor_tpu.utils.jax_cache import enable_compile_cache

    enable_compile_cache()

    cfg = Config(framework="MONO", integrator="rk4", num_envs=args.num_envs,
                 max_steps=4000)
    key = jax.random.PRNGKey(0)
    bs, obs = jax.jit(
        lambda k: batch.batched_reset(cfg, k), static_argnums=()
    )(key)

    n_act = cfg.num_envs

    def policy(_, ob, k):
        return jax.random.uniform(k, (n_act, 4), jnp.float32, -0.1, 0.1)

    # 1000 scanned steps per dispatch: at 200 the measurement was dominated
    # by host->device dispatch latency through the tunnel (~1 ms/call vs
    # ~4 ms of device time), under-reporting the engine by 3.4x at 4096 envs
    steps_per_call = 1000

    @jax.jit
    def run(b, o, k):
        b, o, trs, outs = batch.rollout(cfg, b, o, k, policy, None,
                                        steps_per_call)
        # return a small reduction so the scan isn't dead-code eliminated
        return b, o, outs.reward.sum()

    def barrier(x):
        """Real device-completion barrier: a host TRANSFER of a reduction.

        jax.block_until_ready is a NO-OP through the axon tunnel (measured
        2026-08-18, scripts/block_semantics_probe.py: a ~8.6 TFLOP program
        'blocked' in 0.1 ms; the actual float() transfer took 120 s), so
        any timing fenced by it measures dispatch, not compute.  A device
        executes whole programs in order, so transferring any output of
        the LAST chained call is a correct fence for the entire sequence."""
        return float(jnp.sum(x))

    # warmup/compile
    bs, obs, _ = run(bs, obs, jax.random.PRNGKey(1))
    barrier(bs.env.x)

    # Two-point slope measurement: the fence transfer costs one tunnel
    # round trip (~32 ms measured), which would dominate any single fenced
    # timing whose device work is not >> RTT.  Timing a SHORT chain and a
    # LONG chain of the same compiled call, each fenced once, and taking
    #   rate = extra_work / (dt_long - dt_short)
    # cancels the RTT and every other per-measurement constant.  Per-call
    # dispatch does not cancel, but it pipelines under device execution
    # (calls here are ~50 ms of device time vs ~1-3 ms dispatch).
    def timed_chain(iters, seed0):
        nonlocal bs, obs
        t0 = time.perf_counter()
        for i in range(iters):
            bs, obs, s = run(bs, obs, jax.random.PRNGKey(seed0 + i))
        barrier(bs.env.x)
        return time.perf_counter() - t0

    iters_a = 2
    dt_cal = timed_chain(iters_a, 100)
    # size the long chain so the extra device work is ~4 s (RTT jitter of a
    # few ms is then <0.5% of the slope), capped to bound runtime
    extra = min(400, max(3, int(4.0 / max(dt_cal / iters_a, 1e-3))))
    rate = 0.0
    for rep in range(2):  # best of two slopes: sheds transient contention
        dt_a = timed_chain(iters_a, 200 + 50 * rep)
        dt_b = timed_chain(iters_a + extra, 300 + 500 * rep)
        rate = max(rate,
                   extra * steps_per_call * cfg.num_envs / (dt_b - dt_a))
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": rate,
        "unit": "steps/s",
        "vs_baseline": rate / TARGET,
        "num_envs": cfg.num_envs,
    }))


if __name__ == "__main__":
    main()
