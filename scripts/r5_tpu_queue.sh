#!/bin/bash
# Round-5 TPU queue: serial single-process TPU runs (one session at a time
# through the axon tunnel). Re-baselines after the SB3 timeout-bootstrap
# parity fix + cast_params_once speed lever, then the 20M DQN stabilizer
# cells, then the 30M PPO asymptote run (VERDICT round-4 items 1-4).
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 1. PPO 3M re-baselines (new value-target semantics + speed lever A/Bs)
python -u scripts/sweep_ppo.py n1024_b16384_r5 n1024_b16384_a2ccur_r5 \
    n1024_b32768_a2ccur_r5 n1024_b16384_a2ccur_f32cast \
    2>&1 | tee -a runs/r5_queue_ppo.log

# 2. A2C flagship re-baseline (raw-reward Monitor stats)
python -u scripts/sweep_a2c.py dqnrew_a2ccur_r5 \
    2>&1 | tee -a runs/r5_queue_a2c.log

# 3. DQN 20M stabilizer cells (collapse fix)
python -u scripts/sweep_dqn_stability.py 20m_lrgate 20m_lrgate_deep \
    20m_t50k 20m_clip50 20m_clip10 20m_clip50_lrgate \
    2>&1 | tee -a runs/r5_queue_dqn.log

# 4. PPO 30M asymptote run
python -u scripts/sweep_ppo.py n1024_b16384_a2ccur_30m \
    2>&1 | tee -a runs/r5_queue_ppo30m.log

echo "R5 QUEUE DONE"
