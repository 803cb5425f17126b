#!/bin/bash
# Round-3b on-device measurement session — run when the axon tunnel is up.
# Strictly serial (one TPU process at a time; dispatch blocks while busy).
# Appends structured rows to bench_history.jsonl; console log to $LOG.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-bench_r3b_device.log}

run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 2400 env "$@" 2>&1 | tail -20 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- rc=$rc" | tee -a "$LOG"
}

# 1. Step decomposition + one-hot micro A/B (row vs flipped forms).
run python scripts/onehot_probe.py

# 2. New default 1spp step (flip + plane-native sweep).
run python scripts/grad_bench.py --config default_auto

# 3. Same step with the flip reverted (isolates the one-hot change).
run RTW_ONEHOT_NOFLIP=1 python scripts/grad_bench.py --config default_auto

# 4. Lean 11-slice record at 1spp (its cost vs the 21-slice default).
run python scripts/grad_bench.py --config persist_lean_auto

# 5-7. spp scaling with the exact pass-memory planning:
#      4 -> stores records (was remat), 8 -> lean records (was remat),
#      16 -> pass remat (unchanged).
run python scripts/grad_bench.py --config default_auto --spp 4
run python scripts/grad_bench.py --config default_auto --spp 8
run python scripts/grad_bench.py --config default_auto --spp 16

# 7b. Fused whole-phase replay (one pallas_call per record phase) vs the
#     per-iteration loop — the round-3c lever; distinct label so a slower
#     result cannot displace the default_auto headline.
run python scripts/grad_bench.py --config persist_rfused_auto
run python scripts/grad_bench.py --config persist_rfused_auto --spp 4
run python scripts/grad_bench.py --config fused_rfused_auto
run python scripts/grad_bench.py --config persist_s16_rfused_auto

# 8. Driver metric line (forward + grad headline from history).
run python bench.py

# 9. On-device validation sweep (goldens, both paths, FD, f64 anchor) —
#    confirms the one-hot flip and lean-record changes on the chip.
run python scripts/tpu_validate.py

echo "=== session done $(date)" | tee -a "$LOG"
