#!/bin/bash
# Fires the round-5 on-chip measurement queue as soon as the VMH protocol
# run releases the chip (timing on the contended relay is meaningless).
cd /root/repo
LOG=artifacts/chip_r5.log
echo "=== waiting for VMH supervisor to exit $(date -u +%H:%M:%S) ===" >> "$LOG"
while pgrep -f "run_vmh_r5.sh" > /dev/null 2>&1; do
  sleep 60
done
echo "=== chip free $(date -u +%H:%M:%S) ===" >> "$LOG"

echo "--- dia variant A/B ---" >> "$LOG"
timeout 1500 python artifacts/chip_ab_r5.py dia >> "$LOG" 2>&1

echo "--- fused-bwd memory: xla ---" >> "$LOG"
timeout 600 python artifacts/chip_ab_r5.py mem xla >> "$LOG" 2>&1
echo "--- fused-bwd memory: pallas ---" >> "$LOG"
timeout 600 python artifacts/chip_ab_r5.py mem pallas >> "$LOG" 2>&1

echo "--- compiled checks (all sections) ---" >> "$LOG"
timeout 2400 python tests/tpu_compiled_checks.py >> "$LOG" 2>&1

echo "--- bench.py full ---" >> "$LOG"
timeout 1800 python bench.py > artifacts/bench_r5_pre.json 2>> "$LOG"

echo "=== queue done $(date -u +%H:%M:%S) ===" >> "$LOG"
