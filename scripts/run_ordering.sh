#!/bin/bash
# Reproduce the reference's 4-way learning-curve ordering (README.md:130-137):
# round 1 ran Mod-EMLP and Mono-MLP; this adds Mono-EMLP and Mod-MLP.
set -u
cd /root/repo
mkdir -p results/ordering

echo "=== Mono-EMLP (TD3, MONO, use_equiv) ==="
timeout 18000 python train.py --framework MONO --rl_algo TD3 --use_equiv True \
    --num_envs 32 --updates_per_step 32 --start_timesteps 50000 \
    --max_timesteps 1000000 --eval_freq 50000 --num_eval 10 \
    --batch_size 256 --seed 1992 \
    > results/ordering/mono_emlp.log 2>&1
echo "mono-emlp exit: $?"

echo "=== Mod-MLP (TD3, MODUL, MLP) ==="
timeout 18000 python train.py --framework MODUL --rl_algo TD3 --use_equiv False \
    --num_envs 32 --updates_per_step 32 --start_timesteps 30000 \
    --max_timesteps 600000 --eval_freq 50000 --num_eval 10 \
    --batch_size 256 --seed 1992 \
    > results/ordering/mod_mlp.log 2>&1
echo "mod-mlp exit: $?"
