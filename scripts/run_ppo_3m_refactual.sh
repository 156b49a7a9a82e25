#!/bin/bash
# Process-level retry loop for the 3M RecurrentPPO TPU run: a TPU-worker
# crash poisons the PJRT client, so each attempt needs a fresh process.
# Resume comes from the Orbax checkpoints (checkpoint_interval=100k).
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"
LOG=runs/ppo_tpu_3m_refactual_run.log
for attempt in $(seq 1 12); do
  echo "[run_ppo_3m.sh] attempt $attempt $(date)" | tee -a "$LOG"
  python -u scripts/run_ppo_3m_refactual.py >> "$LOG" 2>&1
  status=$?
  if [ $status -eq 0 ] && grep -q "^DONE" "$LOG"; then
    echo "[run_ppo_3m.sh] complete" | tee -a "$LOG"
    exit 0
  fi
  echo "[run_ppo_3m.sh] attempt $attempt exited $status; sleeping 300s" | tee -a "$LOG"
  sleep 420
done
echo "[run_ppo_3m.sh] giving up after 12 attempts" | tee -a "$LOG"
exit 1
