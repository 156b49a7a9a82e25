#!/bin/bash
# Round-3 serialized TPU job queue (one TPU process at a time):
#   1. wait for the in-flight r3b DQN run to finish
#   2. r3c: clean-timed 10M-step 512-env DQN run (cached compiles,
#      eval-fn reuse) — the wall-clock headline
#   3. A2C exploration sweep (8 configs x 10M steps)
#   4. RecurrentPPO at 128 envs, 3M steps (reference-parity config);
#      first chunk attempt at n_steps=1024, fallback to 256
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
Q=runs/r3_queue.log
echo "[queue] start $(date)" >> "$Q"

# 1. wait for r3b (marker written by its retry wrapper)
for i in $(seq 1 240); do
  if grep -q "\[r3b dqn512\] complete\|giving up" runs/dqn_tpu_10m_512env_r3b_run.log 2>/dev/null; then break; fi
  sleep 15
done
echo "[queue] r3b done $(date)" >> "$Q"

# 2. r3c timed DQN
LOG=runs/dqn_tpu_10m_512env_r3c_run.log
for attempt in 1 2 3; do
  echo "[r3c dqn512] attempt $attempt $(date)" >> "$LOG"
  DQN_LOG_DIR=runs/dqn_tpu_10m_512env_r3c DQN_SEED=2 \
    python -u scripts/run_dqn_10m_512.py >> "$LOG" 2>&1
  if [ $? -eq 0 ] && grep -q "^DONE" "$LOG"; then
    echo "[r3c dqn512] complete" >> "$LOG"; break
  fi
  echo "[r3c dqn512] attempt $attempt failed; sleeping 240s" >> "$LOG"
  sleep 240
done
echo "[queue] r3c done $(date)" >> "$Q"

# 3. A2C sweep (resumable per-config; retry loop for worker crashes)
for attempt in 1 2 3 4; do
  echo "[a2c sweep] attempt $attempt $(date)" >> runs/a2c_sweep_run.log
  python -u scripts/sweep_a2c.py >> runs/a2c_sweep_run.log 2>&1 && break
  sleep 240
done
echo "[queue] a2c sweep done $(date)" >> "$Q"

# 4. PPO at 128 envs: one attempt at reference-exact n_steps=1024, then
# the worker-stable 256 recipe
LOG=runs/ppo_tpu_3m_128_run.log
echo "[ppo128] probing n_steps=1024 $(date)" >> "$LOG"
PPO_N_STEPS=1024 PPO_LOG_DIR=runs/ppo_tpu_3m_128_1024 \
  timeout 2400 python -u scripts/run_ppo_3m_128.py >> "$LOG" 2>&1
if grep -q "^DONE" "$LOG"; then
  echo "[ppo128] n_steps=1024 run complete" >> "$LOG"
else
  echo "[ppo128] 1024 probe failed/timed out; falling back to 256 $(date)" >> "$LOG"
  for attempt in 1 2 3 4 5 6; do
    echo "[ppo128] attempt $attempt (n_steps=256) $(date)" >> "$LOG"
    PPO_N_STEPS=256 timeout 5400 python -u scripts/run_ppo_3m_128.py >> "$LOG" 2>&1
    if grep -q "^DONE" "$LOG"; then
      echo "[ppo128] complete" >> "$LOG"; break
    fi
    echo "[ppo128] attempt $attempt failed; sleeping 240s" >> "$LOG"
    sleep 240
  done
fi
echo "[queue] all done $(date)" >> "$Q"
