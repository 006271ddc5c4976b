#!/bin/bash
# Round-3 chip session v5: STAGED taxid validation (the monolithic
# graph is confirmed compile-dead on this backend — BENCH_NOTES
# 2026-08-20 18:41 session).  Run detached AFTER the post-kill wedge
# window clears (~60 min from the 19:19:09 kill): the canary gates all
# compile-needing phases.  Never under external timeout/kill.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T=/tmp/chip_round3d
mkdir -p "$T"

echo "=== canary ($(date -u +%H:%M:%S)) ==="
python scripts/exp_compile_canary.py 2>&1 | tee "$T/canary.log"
if [ "${PIPESTATUS[0]}" -ne 0 ]; then
  echo "canary failed — compile queue unhealthy; stopping"
  exit 0
fi

echo "=== staged taxid validation ($(date -u +%H:%M:%S)) ==="
bash scripts/chip_taxid_validate.sh "$T/taxval" 2>&1 | tee "$T/taxval.log"
TAXVAL=${PIPESTATUS[0]}
echo "taxval exit: $TAXVAL" | tee -a "$T/taxval.log"

echo "=== bench --stream (production streamed metric) ($(date -u +%H:%M:%S)) ==="
python bench.py --stream 2>&1 | tee "$T/bench_stream.log"
echo "bench --stream exit: ${PIPESTATUS[0]}" | tee -a "$T/bench_stream.log"

echo "=== multibucket v2 ($(date -u +%H:%M:%S)) ==="
python scripts/exp_multibucket_chip.py 2>&1 | tee "$T/multibucket.log"
echo "multibucket exit: ${PIPESTATUS[0]}" | tee -a "$T/multibucket.log"

if [ "$TAXVAL" -eq 0 ]; then
  echo "=== split3 compile probe (session end only) ($(date -u +%H:%M:%S)) ==="
  CHIP_PROBE_SPLIT3=1 python scripts/exp_split3_probe.py 2>&1 | tee "$T/split3.log"
  echo "split3 exit: ${PIPESTATUS[0]}" | tee -a "$T/split3.log"
else
  echo "skipping split3 probe (taxval failed — keep the queue clean)"
fi

echo "=== session done ($(date -u +%H:%M:%S)) ==="
