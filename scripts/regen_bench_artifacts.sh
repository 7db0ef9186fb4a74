#!/bin/bash
# THE single entrypoint for performance artifacts: regenerates every
# docs/bench chip artifact with the slope-method benches (bench.py /
# bench_train.py — transfer fences, RTT-cancelling two-point slope), then
# verifies the docs quote exactly what the artifacts measure
# (scripts/check_docs_claims.py).
#
# Runs strictly sequentially: the configs share one chip.  Generous
# timeouts — never kill a TPU process mid-compile (axon wedge,
# docs/DESIGN.md).  Cross-session chip numbers are not comparable
# (server-side load on the shared tunnel varies); always regenerate the
# whole set in one session before touching a docs number.
set -u
cd "$(dirname "$0")/.."
B=docs/bench

run() { # $1=outfile, rest=command
  out=$1; shift
  echo ">>> $* -> $out" >&2
  timeout 3000 "$@" 2>/dev/null | tail -1 > "$out.tmp" && mv "$out.tmp" "$out" \
      || { echo "FAILED rc=$? ($out)" >&2; rm -f "$out.tmp"; }
  cat "$out" >&2
}

run $B/env_1024.json  python bench.py --num_envs 1024 --skip_probe
run $B/env_4096.json  python bench.py --num_envs 4096 --skip_probe
run $B/env_16384.json python bench.py --num_envs 16384 --skip_probe
run $B/env_65536.json python bench.py --num_envs 65536 --skip_probe

T="--num_envs 4096 --rollout_len 200"
run $B/train_mono_mlp_1to1_len200.json   python bench_train.py $T --mlp
run $B/train_modul_emlp_1to1_len200.json python bench_train.py $T
run $B/train_modul_emlp_fold_1to1_len200.json python bench_train.py $T --fold
run $B/train_modul_emlp_warm_len200.json python bench_train.py $T --warm
run $B/train_modul_emlp_sac_len200.json  python bench_train.py $T --algo sac
run $B/train_modul_emlp_ppo_h204800.json \
    python bench_train.py --num_envs 4096 --rollout_len 50 --algo ppo
run $B/train_mono_mlp_1to1.json \
    python bench_train.py --num_envs 4096 --rollout_len 50 --mlp

python scripts/check_docs_claims.py || {
  echo "artifacts regenerated but docs are now stale — update the quoted" >&2
  echo "numbers (README.md / PARITY.md / docs/DESIGN.md) to match" >&2
  exit 1
}
echo "ALL-DONE" >&2
