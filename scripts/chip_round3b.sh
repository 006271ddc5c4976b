#!/bin/bash
# Round-3 chip session v3 (post fori_loop fix): taxid validation with
# the compact programs, multibucket v2 (low-distinct data), split3
# compile probe.  Run detached (never under external timeout/kill).
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T=/tmp/chip_round3b
mkdir -p "$T"

echo "=== canary ($(date -u +%H:%M:%S)) ==="
python scripts/exp_compile_canary.py 2>&1 | tee "$T/canary.log"
if [ "${PIPESTATUS[0]}" -ne 0 ]; then
  echo "canary failed — compile queue unhealthy; stopping"
  exit 0
fi

echo "=== taxid validation ($(date -u +%H:%M:%S)) ==="
bash scripts/chip_taxid_validate.sh "$T/taxval" 2>&1 | tee "$T/taxval.log"
echo "taxval exit: ${PIPESTATUS[0]}" | tee -a "$T/taxval.log"

echo "=== multibucket v2 ($(date -u +%H:%M:%S)) ==="
python scripts/exp_multibucket_chip.py 2>&1 | tee "$T/multibucket.log"
echo "multibucket exit: ${PIPESTATUS[0]}" | tee -a "$T/multibucket.log"

echo "=== split3 compile probe ($(date -u +%H:%M:%S)) ==="
CHIP_PROBE_SPLIT3=1 python scripts/exp_split3_probe.py 2>&1 | tee "$T/split3.log"
echo "split3 exit: ${PIPESTATUS[0]}" | tee -a "$T/split3.log"

echo "=== session done ($(date -u +%H:%M:%S)) ==="
