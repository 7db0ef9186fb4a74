#!/bin/bash
# Learning evidence for the MODUL (decoupled two-agent) task across the
# remaining algorithm families: README already covers TD3/MATD3 MODUL and
# the SAC/PPO MONO variants; this adds SAC-EMLP and PPO-EMLP on MODUL
# (reference model rows 19/20, sac_emlp.py / ppo_emlp.py MODUL1+MODUL2).
set -u
cd /root/repo
mkdir -p results/long

echo "=== SAC-EMLP MODUL to 300k ==="
timeout 14000 python -u train.py --framework MODUL --rl_algo SAC --use_equiv True \
    --num_envs 32 --updates_per_step 32 --start_timesteps 30000 \
    --max_timesteps 300000 --eval_freq 25000 --num_eval 10 --seed 1992 \
    > results/long/sac_emlp_modul_300k.log 2>&1
echo "sac-emlp-modul exit: $?"

echo "=== PPO-EMLP MODUL to 1M ==="
timeout 14000 python -u train.py --framework MODUL --rl_algo PPO --use_equiv True \
    --num_envs 32 --max_timesteps 1000000 --T_horizon 7000 \
    --eval_freq 50000 --num_eval 10 --seed 1992 \
    > results/long/ppo_emlp_modul_1m.log 2>&1
echo "ppo-emlp-modul exit: $?"
