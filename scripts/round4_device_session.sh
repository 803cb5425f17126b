#!/bin/bash
# Round-4 on-device measurement session: gradient-step levers toward the
# ~27 Mpaths/s speed-of-light (VERDICT r3 #3). Strictly serial (one TPU
# process at a time). Appends rows to bench_history.jsonl; log to $LOG.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-bench_r4_device.log}

run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 2400 env "$@" 2>&1 | tail -20 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- rc=$rc" | tee -a "$LOG"
}

# 0. Gradient corruption canary (must PASS before any number is trusted).
run python scripts/grad_bench.py --canary

# 1. Tail-compaction boundary drop audit (earlier boundary admissible?).
run python scripts/tc_audit.py

# 2. Grouped dattr contraction (G=8 default since this round) end-to-end.
run python scripts/grad_bench.py --config default_auto

# 3. G=1 control (the per-slot scan the grouped path replaced).
run RTW_DATTR_GROUP=1 python scripts/grad_bench.py --config default_auto

# 4. G=16 (is bigger better?).
run RTW_DATTR_GROUP=16 python scripts/grad_bench.py --config default_auto

# 5-6. Earlier /16 boundaries: DISQUALIFIED by the audit (boundary 40
#      drops 4787 paths, 36 drops ~32k; only 44 is exact — tc_audit_worst
#      row, 2026-08-19). Nothing to bench.

# 7. spp scaling re-check on the winning configuration.
run python scripts/grad_bench.py --config default_auto --spp 4
run python scripts/grad_bench.py --config default_auto --spp 16

# 8. Exactness + parity sweep on the final defaults.
run python scripts/tpu_validate.py
