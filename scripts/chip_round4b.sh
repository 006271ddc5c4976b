#!/bin/bash
# Round-4 chip session B (after the 21:22 kill of the starved fused
# stage-2 compile; start >= 60 min later — the wedge clock runs from
# the kill).  Phase order REVERSED vs session A: the proven-compilable
# phases bank their numbers first, the taxid validation (with the
# dynamic_slice stage-2 rewrite + 4-program bisect minis) runs last so
# a second starvation cannot consume the session.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
T=/tmp/chip_round4b
OLD=/root/reference/testdata/old
FIX_MD5=4c038832209278840d4d75944b29219c
mkdir -p "$T"

echo "=== canary ($(date -u +%H:%M:%S)) ==="
python scripts/exp_compile_canary.py 2>&1 | tee "$T/canary.log"
if [ "${PIPESTATUS[0]}" -ne 0 ]; then
  echo "canary failed — compile queue unhealthy; stopping"
  exit 0
fi

echo "=== 1. bench --stream (streamed headline) ($(date -u +%H:%M:%S)) ==="
python bench.py --stream 2>&1 | tee "$T/bench_stream.log"
echo "bench --stream exit: ${PIPESTATUS[0]}"

echo "=== 2. multibucket B sweep ($(date -u +%H:%M:%S)) ==="
python scripts/exp_multibucket_chip.py 2>&1 | tee "$T/multibucket.log"
echo "multibucket exit: ${PIPESTATUS[0]}"

echo "=== 3. mesh n=1 on the real chip (non-taxid) ($(date -u +%H:%M:%S)) ==="
UNIKMER_TPU_HOST_COUNT=1 bin/unikmer-tpu count -k 23 -K -s \
  "$OLD/A.muciniphila-ATCC_BAA-835.fasta.gz" -o "$T/amuc_host"
t0=$SECONDS
UNIKMER_TPU_HOST_COUNT=0 python -m unikmer_tpu.cli.main count --verbose \
  -k 23 -K -s --mesh 1 \
  "$OLD/A.muciniphila-ATCC_BAA-835.fasta.gz" -o "$T/amuc_mesh1" \
  2> "$T/mesh1_count.log" || tail -25 "$T/mesh1_count.log"
echo "mesh1 count wall: $((SECONDS - t0)) s"
MH=$(bin/unikmer-tpu view -t "$T/amuc_host.unik" | md5sum | cut -d' ' -f1)
MM=$(bin/unikmer-tpu view -t "$T/amuc_mesh1.unik" 2>/dev/null | md5sum | cut -d' ' -f1)
[ "$MH" = "$MM" ] && echo "MESH1-COUNT: EXACT" || echo "MESH1-COUNT: MISMATCH ($MH vs $MM)"

UNIKMER_TPU_HOST_COUNT=1 bin/unikmer-tpu count -k 23 -K -s \
  "$OLD/Ecoli-IAI39.fasta.gz" -o "$T/iai39_nt"
UNIKMER_TPU_HOST_COUNT=1 bin/unikmer-tpu count -k 23 -K -s \
  "$OLD/Ecoli-MG1655.fasta.gz" -o "$T/mg1655_nt"
bin/unikmer-tpu union -s "$T/iai39_nt.unik" "$T/mg1655_nt.unik" \
  -o "$T/union_host_nt"
t0=$SECONDS
python -m unikmer_tpu.cli.main union --verbose --mesh 1 -s \
  "$T/iai39_nt.unik" "$T/mg1655_nt.unik" -o "$T/union_mesh1" \
  2> "$T/mesh1_union.log" || tail -25 "$T/mesh1_union.log"
echo "mesh1 union wall: $((SECONDS - t0)) s"
UH=$(bin/unikmer-tpu view "$T/union_host_nt.unik" | md5sum | cut -d' ' -f1)
UM=$(bin/unikmer-tpu view "$T/union_mesh1.unik" 2>/dev/null | md5sum | cut -d' ' -f1)
[ "$UH" = "$UM" ] && echo "MESH1-UNION: EXACT" || echo "MESH1-UNION: MISMATCH ($UH vs $UM)"

echo "=== 4. grep device tier timing ($(date -u +%H:%M:%S)) ==="
python scripts/exp_grep_chip.py 2>&1 | tee "$T/grep.log"
echo "grep exit: ${PIPESTATUS[0]}"

echo "=== 5. staged taxid validation (dynamic_slice stage 2) ($(date -u +%H:%M:%S)) ==="
bash scripts/chip_taxid_validate.sh "$T/taxval" 2>&1 | tee "$T/taxval.log"
TAXVAL=${PIPESTATUS[0]}
echo "taxval exit: $TAXVAL"

if [ "$TAXVAL" -eq 0 ]; then
  echo "=== 6. mesh n=1 TAXID union ($(date -u +%H:%M:%S)) ==="
  t0=$SECONDS
  python -m unikmer_tpu.cli.main union --verbose --mesh 1 -s \
    "$T/taxval/iai39.k23.unik" "$T/taxval/mg1655.k23.unik" \
    -o "$T/union_mesh1_tax" 2> "$T/mesh1_uniontax.log" \
    || tail -25 "$T/mesh1_uniontax.log"
  echo "mesh1 taxid union wall: $((SECONDS - t0)) s"
  TM=$(bin/unikmer-tpu view -t "$T/union_mesh1_tax.unik" 2>/dev/null | md5sum | cut -d' ' -f1)
  [ "$TM" = "$FIX_MD5" ] && echo "MESH1-TAXID-UNION: EXACT" \
    || echo "MESH1-TAXID-UNION: MISMATCH ($TM)"

  echo "=== 7. split3 compile probe (session end only) ($(date -u +%H:%M:%S)) ==="
  CHIP_PROBE_SPLIT3=1 python scripts/exp_split3_probe.py 2>&1 | tee "$T/split3.log"
  echo "split3 exit: ${PIPESTATUS[0]}"
else
  echo "skipping taxid mesh + split3 (taxval failed — keep the queue clean)"
fi

echo "=== session done ($(date -u +%H:%M:%S)) ==="
