#!/bin/bash
# Process-level retry loop for the continue-from-reference-checkpoint DQN
# run (fresh process per attempt; resume from Orbax checkpoints).
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
LOG=runs/dqn_tpu_continue_ref_run.log
for attempt in $(seq 1 8); do
  echo "[run_dqn_continue_ref.sh] attempt $attempt $(date)" | tee -a "$LOG"
  python -u scripts/run_dqn_continue_ref.py >> "$LOG" 2>&1
  status=$?
  if [ $status -eq 0 ] && grep -q "^DONE" "$LOG"; then
    echo "[run_dqn_continue_ref.sh] complete" | tee -a "$LOG"
    exit 0
  fi
  echo "[run_dqn_continue_ref.sh] attempt $attempt exited $status; sleeping 300s" | tee -a "$LOG"
  sleep 300
done
echo "[run_dqn_continue_ref.sh] giving up after 8 attempts" | tee -a "$LOG"
exit 1
