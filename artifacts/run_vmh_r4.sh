#!/bin/bash
# Round-4 VMH parity run: full reference protocol at rtol=1e-7 (VERDICT r3
# item 1). Supervised: the axon relay occasionally kills long runs, so the
# trainer checkpoints every 5 epochs and this loop resumes it until the
# 200-epoch artifact is complete.
cd /root/repo
LOG=artifacts/vmh_parity_r4.jsonl
CKPT=artifacts/vmh_parity_r4.ckpt.pkl
for attempt in $(seq 1 40); do
  echo "=== attempt $attempt $(date -u +%H:%M:%S) ===" >> artifacts/vmh_parity_r4.log
  timeout 7200 python examples/train_vmh.py \
    --epochs 200 --rtol 1e-7 --ckpt-steps 256 --accum 4 --log-every 1 \
    --log-path "$LOG" --ckpt-path "$CKPT" >> artifacts/vmh_parity_r4.log 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== done rc=0 $(date -u +%H:%M:%S) ===" >> artifacts/vmh_parity_r4.log
    exit 0
  fi
  echo "=== died rc=$rc, resuming ===" >> artifacts/vmh_parity_r4.log
  sleep 10
done
exit 1
