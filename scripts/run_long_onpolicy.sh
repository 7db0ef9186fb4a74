#!/bin/bash
# Extend the two still-climbing README rows (VERDICT r1 "keep pushing"):
# PPO-MLP MONO was 695.1 benchmark at 600k and rising; SAC-MLP MONO was
# 753.7 at 300k.  Same invocations as the round-1 runs, longer horizons.
set -u
cd /root/repo
mkdir -p results/long

echo "=== PPO-MLP MONO to 2M ==="
timeout 21000 python -u train.py --framework MONO --rl_algo PPO --use_equiv False \
    --num_envs 32 --max_timesteps 2000000 --T_horizon 7000 \
    --eval_freq 50000 --num_eval 10 --seed 1992 \
    > results/long/ppo_mono_2m.log 2>&1
echo "ppo exit: $?"

echo "=== SAC-MLP MONO to 1M ==="
timeout 14000 python -u train.py --framework MONO --rl_algo SAC --use_equiv False \
    --num_envs 32 --updates_per_step 32 --start_timesteps 30000 \
    --max_timesteps 1000000 --eval_freq 50000 --num_eval 10 --seed 1992 \
    > results/long/sac_mono_1m.log 2>&1
echo "sac exit: $?"
