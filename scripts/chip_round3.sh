#!/bin/bash
# Round-3 chip session: run SEQUENTIALLY in tmux (never under external
# timeout/kill — CLAUDE.md device discipline).  Phases:
#   1. device taxid routes validation (packed-key single-operand sort)
#   2. multi-bucket / dual-step streamed count measurement
#   3. bench.py --all-configs (per-config regression numbers)
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T=/tmp/chip_round3
mkdir -p "$T"

# ORDER: cached-program bench first (no new compiles — secures the
# BENCH numbers and proves execution health), then measurements that
# need ONE new small compile, then the taxid validation (new compiles;
# the 2026-08-20 sessions starved in compile, see BENCH_NOTES).
echo "=== phase 1: bench (cached programs) ($(date -u +%H:%M:%S)) ==="
python bench.py --all-configs 2>&1 | tee "$T/bench.log"
echo "phase1 exit: ${PIPESTATUS[0]}" | tee -a "$T/bench.log"

echo "=== phase 1.5: compile canary ($(date -u +%H:%M:%S)) ==="
python scripts/exp_compile_canary.py 2>&1 | tee "$T/canary.log"
CANARY=${PIPESTATUS[0]}
if [ "$CANARY" -ne 0 ]; then
  echo "compile canary failed ($CANARY): skipping compile-needing phases"
  echo "=== chip session done early ($(date -u +%H:%M:%S)) ==="
  exit 0
fi

echo "=== phase 2: multi-bucket measurement ($(date -u +%H:%M:%S)) ==="
python scripts/exp_multibucket_chip.py 2>&1 | tee "$T/multibucket.log"
echo "phase2 exit: ${PIPESTATUS[0]}" | tee -a "$T/multibucket.log"

echo "=== phase 3: taxid validation ($(date -u +%H:%M:%S)) ==="
bash scripts/chip_taxid_validate.sh "$T/taxval" 2>&1 | tee "$T/taxval.log"
echo "phase3 exit: ${PIPESTATUS[0]}" | tee -a "$T/taxval.log"

echo "=== chip session done ($(date -u +%H:%M:%S)) ==="
