#!/bin/bash
# Process-level retry loop for the 512-env 10M DQN TPU run (fresh process
# per attempt; resume from Orbax checkpoints every 500k steps).
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
LOG=runs/dqn_tpu_10m_512env_double_run.log
for attempt in $(seq 1 8); do
  echo "[run_dqn_10m_512_double.sh] attempt $attempt $(date)" | tee -a "$LOG"
  python -u scripts/run_dqn_10m_512_double.py >> "$LOG" 2>&1
  status=$?
  if [ $status -eq 0 ] && grep -q "^DONE" "$LOG"; then
    echo "[run_dqn_10m_512_double.sh] complete" | tee -a "$LOG"
    exit 0
  fi
  echo "[run_dqn_10m_512_double.sh] attempt $attempt exited $status; sleeping 300s" | tee -a "$LOG"
  sleep 300
done
echo "[run_dqn_10m_512_double.sh] giving up after 8 attempts" | tee -a "$LOG"
exit 1
