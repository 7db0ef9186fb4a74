"""Verify that every throughput number quoted in the docs matches the
committed artifact it cites (VERDICT r3 #1/#7: no doc may ever again carry
a number its artifact contradicts).

For each artifact under docs/bench/ with a known docs claim, format the
measured value exactly the way the docs quote it and assert the string
appears in the named files.  Exits nonzero listing every mismatch.

Run standalone or via scripts/regen_bench_artifacts.sh (which regenerates
the artifacts first).
"""
from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fmt_m1(v):
    return "%.1fM" % (v / 1e6)


def fmt_m2(v):
    return "%.2fM" % (v / 1e6)


def fmt_k1(v):
    return "%.1fk" % (v / 1e3)


# artifact -> (formatter, files that must quote it)
CLAIMS = {
    "env_1024.json": (fmt_m1, ["README.md"]),
    "env_4096.json": (fmt_m1, ["README.md", "PARITY.md", "docs/DESIGN.md"]),
    "env_16384.json": (fmt_m1, ["README.md"]),
    "env_65536.json": (fmt_m1, ["README.md", "docs/DESIGN.md"]),
    "train_modul_emlp_1to1_len200.json": (
        fmt_k1, ["README.md", "PARITY.md", "docs/DESIGN.md"]),
    "train_modul_emlp_fold_1to1_len200.json": (
        fmt_k1, ["README.md", "docs/DESIGN.md"]),
    "train_mono_mlp_1to1_len200.json": (fmt_m2, ["README.md", "PARITY.md"]),
    "train_modul_emlp_warm_len200.json": (fmt_m2, ["README.md"]),
    "train_modul_emlp_sac_len200.json": (fmt_k1, ["README.md"]),
    "train_modul_emlp_ppo_h204800.json": (fmt_k1, ["README.md"]),
}


def main():
    failures = []
    for art, (fmt, files) in sorted(CLAIMS.items()):
        path = os.path.join(ROOT, "docs", "bench", art)
        if not os.path.exists(path):
            failures.append(f"{art}: artifact missing")
            continue
        with open(path) as f:
            value = json.load(f)["value"]
        want = fmt(value)
        for rel in files:
            with open(os.path.join(ROOT, rel)) as f:
                text = f.read()
            if want not in text:
                failures.append(
                    f"{rel}: expected '{want}' (from {art}) not found")
    if failures:
        print("DOCS-CLAIM CHECK FAILED:")
        for f in failures:
            print("  -", f)
        sys.exit(1)
    print(f"docs-claim check ok: {len(CLAIMS)} artifacts quoted correctly")


if __name__ == "__main__":
    main()
