#!/bin/bash
# Round-5 TPU queue, part 3: combined MCTS levers + lean flagship timing.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 1. MCTS: leaf value + policy-guided rollouts COMBINED (mix<1 keeps
#    rollouts; p=0.8 guides them). Plus a 0.375 mix point, mix-only.
python -u -m rlenv_tpu.apps.mcts_runner --mode test --episodes 32 \
  --simulations 50 --parallel 32 \
  --policy runs/dqn_tpu_10m_512env_r4b/models/best_model \
  --leaf-value-mix 0.5 --policy-prob 0.8 2>&1 | tee -a runs/r5_queue3_mcts.log
python -u -m rlenv_tpu.apps.mcts_runner --mode test --episodes 32 \
  --simulations 50 --parallel 32 \
  --policy runs/dqn_tpu_10m_512env_r4b/models/best_model \
  --leaf-value-mix 0.375 --policy-prob 0 2>&1 | tee -a runs/r5_queue3_mcts.log

# 2. Lean-instrumentation flagship wall-clock (eval/ckpt at 1.5M: 2 each)
PPO_LOG_DIR=runs/ppo_tpu_3m_r5lean PPO_CKPT_INT=1500000 \
  PPO_EVAL_INT=1500000 python -u scripts/run_ppo_3m_r4.py \
  2>&1 | tee -a runs/r5_queue3_ppo.log

echo "R5 QUEUE3 DONE"
