#!/bin/bash
# Regenerate every docs/bench chip artifact with the slope-method benches
# (bench.py / bench_train.py after the transfer-fence + slope fix).  Runs
# strictly sequentially: the configs share one chip.
set -u
cd "$(dirname "$0")/.."
B=docs/bench

run() { # $1=outfile, rest=command
  out=$1; shift
  echo ">>> $* -> $out" >&2
  "$@" 2>/dev/null | tail -1 > "$out.tmp" && mv "$out.tmp" "$out"
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
echo "ALL-DONE" >&2
