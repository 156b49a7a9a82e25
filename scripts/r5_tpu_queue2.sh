#!/bin/bash
# Round-5 TPU queue, part 2: stage-5 DQN cadence cells, warm-cache
# flagship wall-clocks, MCTS leaf-value frontier, mesh-bench on hardware.
set -x
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 1. DQN 20M stage-5 (target cadence is the measured lever)
python -u scripts/sweep_dqn_stability.py 20m_t100k 20m_t200k \
    20m_t50k_lrgate 20m_t100k_lrgate 2>&1 | tee -a runs/r5_queue2_dqn.log

# 2. Warm-cache flagship PPO 3M wall-clock (reference-exact config;
#    target <=250 s end-to-end)
PPO_LOG_DIR=runs/ppo_tpu_3m_r5 python -u scripts/run_ppo_3m_r4.py \
    2>&1 | tee -a runs/r5_queue2_ppo.log

# 3. Warm-cache A2C 10M wall-clock (fresh OUT dir so the dedup re-runs)
SWEEP_OUT=runs/a2c_sweep_r5warm python -u scripts/sweep_a2c.py \
    dqnrew_a2ccur_r5 2>&1 | tee -a runs/r5_queue2_a2c.log

# 4. A2C iteration cadence profile (deferred-bootstrap effect)
PROF_ENVS=512 python -u scripts/profile_a2c.py \
    2>&1 | tee -a runs/r5_queue2_a2cprof.log

# 5. MCTS leaf-value frontier (grid 25, 50 sims, 32 episodes)
for MIX in 1.0 0.5 0.25; do
  python -u -m rlenv_tpu.apps.mcts_runner --mode test --episodes 32 \
    --simulations 50 --parallel 32 \
    --policy runs/dqn_tpu_10m_512env_r4b/models/best_model \
    --leaf-value-mix $MIX 2>&1 | tee -a runs/r5_queue2_mcts.log
done

# 6. Multi-chip bench path on real hardware (1-chip mesh: exercises the
#    shard_map program on TPU; N>1 needs more chips)
python -u bench.py --mesh 1 2>&1 | tee -a runs/r5_queue2_bench.log

echo "R5 QUEUE2 DONE"
