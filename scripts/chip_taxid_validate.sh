#!/bin/bash
# Chip validation of the round-2 compressed device-taxid egress routes
# (docs/BENCH_NOTES.md "raw taxid-result fetch is unusable"): the
# device LCA union (union UNIKMER_TPU_DEVICE_TAXID=1) and device
# count -T, both of which now fetch u32-delta codes + u16 compact ids.
# Ground truth: the jax-free host engine + the README union fixtures
# (number 6,872,728; view -t md5 4c038832209278840d4d75944b29219c).
#
# DEVICE DISCIPLINE (CLAUDE.md): runs device processes sequentially,
# never wraps them in external `timeout`, never kills them — a killed
# pending op wedges the chip for ~45 min.
set -e
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
export UNIKMER_DB=/root/repo/tests/data/taxdump
T=${1:-/tmp/chipval_taxid}
OLD=/root/reference/testdata/old
FIX_MD5=4c038832209278840d4d75944b29219c
mkdir -p "$T"

echo "== host-engine counts (jax-free) =="
UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu count -k 23 -K -s \
  "$OLD/Ecoli-IAI39.fasta.gz" -o "$T/iai39.k23" -t 585057
UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu count -k 23 -K -s \
  "$OLD/Ecoli-MG1655.fasta.gz" -o "$T/mg1655.k23" -t 511145

echo "== host union (oracle) =="
UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu union \
  "$T/iai39.k23.unik" "$T/mg1655.k23.unik" -s -o "$T/union_host"
bin/unikmer-tpu view -t "$T/union_host.unik" > "$T/union_host.txt"
HOST_MD5=$(md5sum < "$T/union_host.txt" | cut -d' ' -f1)
echo "host union md5: $HOST_MD5 (fixture $FIX_MD5)"
# fail fast BEFORE any device run: a host regression or stale fixture
# must not consume a device session (chip wedge = ~45 min lockout)
[ "$HOST_MD5" = "$FIX_MD5" ] || { echo "host oracle != fixture"; exit 1; }
# device sections run `python -m unikmer_tpu.cli.main` directly (not
# bin/unikmer-tpu) so the caller's PALLAS_AXON_POOL_IPS reaches jax —
# the launcher strips it for device-free subcommands and union is
# routed dynamically.  Require it up front:
[ -n "$PALLAS_AXON_POOL_IPS" ] || { echo "PALLAS_AXON_POOL_IPS not set"; exit 1; }

echo "== MINI device union first (2^23 program: isolates compile cost) =="
zcat "$OLD/Ecoli-IAI39.fasta.gz" | head -n 16000 > "$T/mini1.fa"
zcat "$OLD/Ecoli-MG1655.fasta.gz" | head -n 16000 > "$T/mini2.fa"
UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu count -k 23 -K -s \
  "$T/mini1.fa" -o "$T/mini1.k23" -t 585057
UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu count -k 23 -K -s \
  "$T/mini2.fa" -o "$T/mini2.k23" -t 511145
UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu union \
  "$T/mini1.k23.unik" "$T/mini2.k23.unik" -s -o "$T/mini_host"
MH=$(bin/unikmer-tpu view -t "$T/mini_host.unik" | md5sum | cut -d' ' -f1)
# 4-program bisect mode FIRST (stage 2 split into merge-rounds /
# keep-mask): if a stage starves the AOT compiler, the per-stage
# watchdogs name the exact program — the 2026-08-20 21:22 session lost
# 42 min to the FUSED stage-2 compile and had to be killed blind.
t0=$SECONDS
UNIKMER_TPU_DEVICE_TAXID=1 UNIKMER_TPU_COMPRESS_TAXID_INGRESS=0 \
  UNIKMER_TPU_TAXID_STAGE2_SPLIT=1 \
  python -m unikmer_tpu.cli.main union --verbose \
  "$T/mini1.k23.unik" "$T/mini2.k23.unik" -s -o "$T/mini_dev_split" \
  2> "$T/mini_dev_split.log" || { tail -30 "$T/mini_dev_split.log"; exit 1; }
echo "mini device union (stage2-split) wall: $((SECONDS - t0)) s"
MS=$(bin/unikmer-tpu view -t "$T/mini_dev_split.unik" | md5sum | cut -d' ' -f1)
[ "$MH" = "$MS" ] && echo "MINI-UNION-SPLIT: EXACT" \
  || { echo "MINI-UNION-SPLIT: MISMATCH ($MH vs $MS)"; exit 1; }
t0=$SECONDS
# then the production default (fused stage 2)
UNIKMER_TPU_DEVICE_TAXID=1 UNIKMER_TPU_COMPRESS_TAXID_INGRESS=0 \
  python -m unikmer_tpu.cli.main union --verbose \
  "$T/mini1.k23.unik" "$T/mini2.k23.unik" -s -o "$T/mini_dev" \
  2> "$T/mini_dev.log" || { tail -30 "$T/mini_dev.log"; exit 1; }
echo "mini device union wall: $((SECONDS - t0)) s"
MD=$(bin/unikmer-tpu view -t "$T/mini_dev.unik" | md5sum | cut -d' ' -f1)
[ "$MH" = "$MD" ] && echo "MINI-UNION: EXACT" \
  || { echo "MINI-UNION: MISMATCH ($MH vs $MD)"; exit 1; }

echo "== DEVICE union (compressed taxid egress) =="
t0=$SECONDS
UNIKMER_TPU_DEVICE_TAXID=1 \
  python -m unikmer_tpu.cli.main union --verbose \
  "$T/iai39.k23.unik" "$T/mg1655.k23.unik" -s -o "$T/union_dev" \
  2> "$T/union_dev.log" || { tail -30 "$T/union_dev.log"; exit 1; }
echo "device union wall: $((SECONDS - t0)) s"
bin/unikmer-tpu view -t "$T/union_dev.unik" > "$T/union_dev.txt"
DEV_MD5=$(md5sum < "$T/union_dev.txt" | cut -d' ' -f1)
echo "device union md5: $DEV_MD5"
[ "$DEV_MD5" = "$HOST_MD5" ] && [ "$DEV_MD5" = "$FIX_MD5" ] \
  && echo "UNION: EXACT" || { echo "UNION: MISMATCH"; exit 1; }

echo "== count -T input (taxid headers) =="
{ zcat "$OLD/Ecoli-IAI39.fasta.gz" | sed 's/^>\(.*\)/>\1 taxid|585057/';
  zcat "$OLD/Ecoli-MG1655.fasta.gz" | sed 's/^>\(.*\)/>\1 taxid|511145/';
} > "$T/both_taxid.fa"

echo "== host count -T (oracle) =="
UNIKMER_TPU_HOST_COUNT=1 UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu \
  count -k 23 -K -s -T -r 'taxid\|(\d+)' \
  "$T/both_taxid.fa" -o "$T/countT_host"
bin/unikmer-tpu view -t "$T/countT_host.unik" > "$T/countT_host.txt"
CT_HOST_MD5=$(md5sum < "$T/countT_host.txt" | cut -d' ' -f1)

echo "== DEVICE count -T (compressed taxid egress) =="
t0=$SECONDS
UNIKMER_TPU_HOST_COUNT=0 UNIKMER_TPU_DEVICE_TAXID=1 \
  python -m unikmer_tpu.cli.main count --verbose -k 23 -K -s \
  -T -r 'taxid\|(\d+)' "$T/both_taxid.fa" -o "$T/countT_dev" \
  2> "$T/countT_dev.log" || { tail -30 "$T/countT_dev.log"; exit 1; }
echo "device count -T wall: $((SECONDS - t0)) s"
bin/unikmer-tpu view -t "$T/countT_dev.unik" > "$T/countT_dev.txt"
CT_DEV_MD5=$(md5sum < "$T/countT_dev.txt" | cut -d' ' -f1)
echo "count -T host/dev md5: $CT_HOST_MD5 / $CT_DEV_MD5"
[ "$CT_DEV_MD5" = "$CT_HOST_MD5" ] \
  && echo "COUNT-T: EXACT" || { echo "COUNT-T: MISMATCH"; exit 1; }

echo "ALL CHIP TAXID VALIDATIONS PASSED"
