#!/bin/bash
# Round-3 chip session v4 (cold compile cache after VM restart).
# ORDER rationale: the persistent XLA cache was wiped, so the round-end
# driver bench would otherwise compile from scratch — secure the
# headline bench program FIRST, then canary, then the taxid validation
# (the round's goal), then multibucket v2 if healthy.  split3 probe is
# intentionally OMITTED (a starved compile wedges followers and the
# round-end bench).  Run detached; never under external timeout/kill.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T=/tmp/chip_round3c
mkdir -p "$T"

echo "=== phase 1: bench headline (cold cache -> compile+cache) ($(date -u +%H:%M:%S)) ==="
python bench.py 2>&1 | tee "$T/bench.log"
echo "phase1 exit: ${PIPESTATUS[0]}" | tee -a "$T/bench.log"

echo "=== phase 1.5: compile canary ($(date -u +%H:%M:%S)) ==="
python scripts/exp_compile_canary.py 2>&1 | tee "$T/canary.log"
if [ "${PIPESTATUS[0]}" -ne 0 ]; then
  echo "compile canary failed — queue unhealthy; stopping before taxval"
  exit 0
fi

echo "=== phase 2: taxid validation (compact programs) ($(date -u +%H:%M:%S)) ==="
bash scripts/chip_taxid_validate.sh "$T/taxval" 2>&1 | tee "$T/taxval.log"
echo "taxval exit: ${PIPESTATUS[0]}" | tee -a "$T/taxval.log"

echo "=== phase 3: multibucket v2 (low-distinct data) ($(date -u +%H:%M:%S)) ==="
python scripts/exp_multibucket_chip.py 2>&1 | tee "$T/multibucket.log"
echo "multibucket exit: ${PIPESTATUS[0]}" | tee -a "$T/multibucket.log"

echo "=== session done ($(date -u +%H:%M:%S)) ==="
