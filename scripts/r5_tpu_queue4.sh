#!/bin/bash
# Round-5 TPU queue, part 4: final probes.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 1. MCTS combined, push the mix: 0.625 with guided rollouts
python -u -m rlenv_tpu.apps.mcts_runner --mode test --episodes 32 \
  --simulations 50 --parallel 32 \
  --policy runs/dqn_tpu_10m_512env_r4b/models/best_model \
  --leaf-value-mix 0.625 --policy-prob 0.8 2>&1 | tee -a runs/r5_queue4_mcts.log

# 2. Recommended-config (b32768) bare wall-clock for the 3M budget
PPO_LOG_DIR=runs/ppo_tpu_3m_r5b32k PPO_BATCH=32768 \
  PPO_CURRICULUM=a2c PPO_CKPT_INT=99999999 PPO_EVAL_INT=99999999 \
  python -u scripts/run_ppo_3m_r4.py 2>&1 | tee -a runs/r5_queue4_ppo.log

echo "R5 QUEUE4 DONE"
