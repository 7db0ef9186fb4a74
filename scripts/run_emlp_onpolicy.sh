#!/bin/bash
# Learning evidence for the equivariant SAC/PPO model classes (reference
# rows 19/20): round 1/2 curves covered TD3-EMLP and the MLP variants of
# SAC/PPO only.
set -u
cd /root/repo
mkdir -p results/long

echo "=== PPO-EMLP MONO to 2M ==="
timeout 21000 python -u train.py --framework MONO --rl_algo PPO --use_equiv True \
    --num_envs 32 --max_timesteps 2000000 --T_horizon 7000 \
    --eval_freq 50000 --num_eval 10 --seed 1992 \
    > results/long/ppo_emlp_mono_2m.log 2>&1
echo "ppo-emlp exit: $?"

echo "=== SAC-EMLP MONO to 500k ==="
timeout 14000 python -u train.py --framework MONO --rl_algo SAC --use_equiv True \
    --num_envs 32 --updates_per_step 32 --start_timesteps 30000 \
    --max_timesteps 500000 --eval_freq 50000 --num_eval 10 --seed 1992 \
    > results/long/sac_emlp_mono_500k.log 2>&1
echo "sac-emlp exit: $?"
