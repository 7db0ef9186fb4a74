#!/bin/bash
# Same-session chip sweep: every row of the README training-throughput table
# re-measured back-to-back on one chip (cross-session chip numbers are not
# comparable — server-side load on the shared axon service varies).
# One TPU process at a time; generous timeouts (never kill mid-compile).
set -u
cd /root/repo
mkdir -p docs/bench

run() {  # run <outfile> <args...>
    out=$1; shift
    echo "=== bench_train $* -> $out ===" >&2
    timeout 1800 python bench_train.py "$@" > "docs/bench/$out" 2>/tmp/sweep_err.log \
        || { echo "FAILED rc=$? ($out)" >&2; tail -5 /tmp/sweep_err.log >&2; }
    cat "docs/bench/$out" >&2
}

run train_modul_emlp_warm_len200.json      --rollout_len 200 --warm
run train_modul_emlp_1to1_len200.json      --rollout_len 200
run train_modul_emlp_fold_1to1_len200.json --rollout_len 200 --fold
run train_mono_mlp_1to1_len200.json        --rollout_len 200 --mlp

echo "=== bench.py env sweep ===" >&2
for n in 1024 4096 16384 65536; do
    timeout 1800 python bench.py --num_envs $n > "docs/bench/env_$n.json" \
        2>/tmp/sweep_err.log \
        || { echo "FAILED env_$n rc=$?" >&2; tail -5 /tmp/sweep_err.log >&2; }
    cat "docs/bench/env_$n.json" >&2
done
echo "sweep done" >&2
