#!/bin/bash
# Round-4 chip session C: the staged taxid validation FIRST (the one
# remaining round-priority; sessions A/B lost it to a starved fused
# stage-2 compile and a backend abort respectively), then grep timing,
# the mesh-1 taxid union, and the session-end compile probes.
# Run after the ABORTED backend recovers (canary gates everything).
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T=/tmp/chip_round4c
export UNIKMER_DB=/root/repo/tests/data/taxdump
FIX_MD5=4c038832209278840d4d75944b29219c
mkdir -p "$T"

echo "=== canary ($(date -u +%H:%M:%S)) ==="
python scripts/exp_compile_canary.py 2>&1 | tee "$T/canary.log"
if [ "${PIPESTATUS[0]}" -ne 0 ]; then
  echo "canary failed — backend still down; stopping"
  exit 0
fi

echo "=== 1. staged taxid validation ($(date -u +%H:%M:%S)) ==="
bash scripts/chip_taxid_validate.sh "$T/taxval" 2>&1 | tee "$T/taxval.log"
TAXVAL=${PIPESTATUS[0]}
echo "taxval exit: $TAXVAL"

if [ "$TAXVAL" -eq 0 ]; then
  echo "=== 2. mesh n=1 TAXID union ($(date -u +%H:%M:%S)) ==="
  t0=$SECONDS
  python -m unikmer_tpu.cli.main union --verbose --mesh 1 -s \
    "$T/taxval/iai39.k23.unik" "$T/taxval/mg1655.k23.unik" \
    -o "$T/union_mesh1_tax" 2> "$T/mesh1_uniontax.log" \
    || tail -25 "$T/mesh1_uniontax.log"
  echo "mesh1 taxid union wall: $((SECONDS - t0)) s"
  TM=$(bin/unikmer-tpu view -t "$T/union_mesh1_tax.unik" 2>/dev/null | md5sum | cut -d' ' -f1)
  [ "$TM" = "$FIX_MD5" ] && echo "MESH1-TAXID-UNION: EXACT" \
    || echo "MESH1-TAXID-UNION: MISMATCH ($TM)"
fi

echo "=== 3. grep device tier timing ($(date -u +%H:%M:%S)) ==="
python scripts/exp_grep_chip.py 2>&1 | tee "$T/grep.log"
echo "grep exit: ${PIPESTATUS[0]}"

echo "=== 4. bench re-run (healthy-tunnel check) ($(date -u +%H:%M:%S)) ==="
python bench.py 2>&1 | tee "$T/bench.log"
python bench.py --stream 2>&1 | tee "$T/bench_stream.log"

if [ "$TAXVAL" -eq 0 ]; then
  echo "=== 5. split3 compile probe (session end) ($(date -u +%H:%M:%S)) ==="
  CHIP_PROBE_SPLIT3=1 python scripts/exp_split3_probe.py 2>&1 | tee "$T/split3.log"
  echo "split3 exit: ${PIPESTATUS[0]}"
  echo "=== 6. non-pow2 sort compile probe ($(date -u +%H:%M:%S)) ==="
  CHIP_PROBE_NONPOW2=1 python scripts/exp_nonpow2_probe.py 2>&1 | tee "$T/nonpow2.log"
  echo "nonpow2 exit: ${PIPESTATUS[0]}"
else
  echo "skipping probes (taxval failed — keep the queue clean)"
fi

echo "=== session done ($(date -u +%H:%M:%S)) ==="
