"""Protocol smoke for bench.py: the driver parses its single JSON line at
round end, so the measurement loop and output schema must not regress —
INCLUDING on failure (round-2 regression: a wedged TPU backend produced a
traceback and rc=1 instead of a parseable error line).  Runs the real
measurement path on CPU with a tiny env batch."""
import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _run_main(argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main(argv)
    lines = [l for l in buf.getvalue().strip().splitlines() if l]
    assert len(lines) == 1, lines
    return json.loads(lines[0])


def test_bench_json_protocol():
    rec = _run_main(["--num_envs", "8", "--skip_probe"])
    assert rec["metric"] == "env_steps_per_sec"
    assert rec["unit"] == "steps/s"
    assert rec["num_envs"] == 8
    assert rec["value"] > 0
    assert rec["vs_baseline"] == rec["value"] / bench.TARGET


def test_bench_emits_error_line_on_crash(monkeypatch):
    """Any exception inside the measurement still yields ONE parseable line."""
    def boom(args):
        raise RuntimeError("synthetic backend wedge")
    monkeypatch.setattr(bench, "_run_bench", boom)
    rec = _run_main(["--num_envs", "8", "--skip_probe"])
    assert rec["metric"] == "env_steps_per_sec"
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0
    assert "synthetic backend wedge" in rec["error"]


def test_bench_emits_error_line_on_probe_failure(monkeypatch):
    """An unrecoverable probe (wedged first compile) yields an error line,
    not a hang or traceback."""
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda **kw: "probe compile timed out after 180s")
    rec = _run_main(["--num_envs", "8"])
    assert rec["value"] == 0.0
    assert "probe" in rec["error"]


def test_probe_subprocess_succeeds_on_cpu(monkeypatch):
    """The real probe subprocess path, forced onto CPU (the axon plugin
    overrides JAX_PLATFORMS, so the probe reads GYM_ROTOR_PROBE_PLATFORM and
    applies it via jax.config post-import).  Exercises the subprocess
    machinery — timeout plumbing, rc/stdout checks — with a healthy
    backend."""
    monkeypatch.setenv("GYM_ROTOR_PROBE_PLATFORM", "cpu")
    err = bench._probe_backend(attempts=1, timeout_s=240.0)
    assert err is None, err


def test_bench_train_json_protocol():
    """bench_train.py shares the one-JSON-line protocol; guard its schema
    (MONO-MLP mode: no EMLP basis solves, fast on CPU)."""
    import bench_train

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench_train.main(["--num_envs", "8", "--rollout_len", "2",
                          "--batch_size", "8", "--iters", "1", "--mlp"])
    lines = [l for l in buf.getvalue().strip().splitlines() if l]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "trained_env_steps_per_sec"
    assert rec["value"] > 0
    assert rec["model"] == "MONO-MLP-TD3"
    assert rec["updates_per_superstep"] == 2


def test_compile_cache_enable_and_optout(tmp_path, monkeypatch):
    """enable_compile_cache points jax at the given/env dir and creates it;
    GYM_ROTOR_NO_COMPILE_CACHE=1 is a no-op returning None."""
    import jax

    from gym_rotor_tpu.utils.jax_cache import enable_compile_cache

    d = tmp_path / "xla"
    monkeypatch.delenv("GYM_ROTOR_NO_COMPILE_CACHE", raising=False)
    got = enable_compile_cache(str(d))
    assert got == str(d) and d.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(d)

    monkeypatch.setenv("GYM_ROTOR_NO_COMPILE_CACHE", "1")
    assert enable_compile_cache(str(tmp_path / "other")) is None
    assert not (tmp_path / "other").exists()
