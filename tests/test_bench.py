"""Protocol smoke for bench.py: the driver parses its single JSON line at
round end, so the measurement loop and output schema must not regress.
Runs the real measurement path on CPU with a tiny env batch."""
import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_bench_json_protocol():
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main(["--num_envs", "8"])
    lines = [l for l in buf.getvalue().strip().splitlines() if l]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec["metric"] == "env_steps_per_sec"
    assert rec["unit"] == "steps/s"
    assert rec["num_envs"] == 8
    assert rec["value"] > 0
    assert rec["vs_baseline"] == rec["value"] / bench.TARGET
