#!/bin/bash
# Round-5b: on-silicon EXACTNESS of the unstable-sort default across
# the golden fixtures (device count md5, device taxid union md5
# fixture, split3 hashed count -T) via the resident server.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
export UNIKMER_DB=/root/repo/tests/data/taxdump
T=${1:-/tmp/chip_round5b}
OLD=/root/reference/testdata/old
SOCK=$T/unikmer.sock
FIX_MD5=4c038832209278840d4d75944b29219c
mkdir -p "$T"
[ -n "${PALLAS_AXON_POOL_IPS:-}" ] || { echo "no pool"; exit 1; }

echo "=== host oracles ==="
UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu count -k 23 -K -s \
  "$OLD/Ecoli-MG1655.fasta.gz" -o "$T/mg_host"
MG_MD5=$(bin/unikmer-tpu view "$T/mg_host.unik" | md5sum | cut -d' ' -f1)
UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu count -k 23 -K -s \
  "$OLD/Ecoli-IAI39.fasta.gz" -o "$T/iai_host" -t 585057
UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu count -k 23 -K -s \
  "$OLD/Ecoli-MG1655.fasta.gz" -o "$T/mg_host_t" -t 511145
{ zcat "$OLD/Ecoli-IAI39.fasta.gz"  | head -8000 | sed 's/^>\(.*\)/>\1 taxid|585057/';
  zcat "$OLD/Ecoli-MG1655.fasta.gz" | head -8000 | sed 's/^>\(.*\)/>\1 taxid|511145/';
} > "$T/mini_taxid.fa"
UNIKMER_TPU_HOST_COUNT=1 UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu \
  count -k 31 -s -T -r 'taxid\|(\d+)' "$T/mini_taxid.fa" -o "$T/miniT_host"
MINI_MD5=$(bin/unikmer-tpu view -t "$T/miniT_host.unik" | md5sum | cut -d' ' -f1)

echo "=== server up ==="
python -m unikmer_tpu.server --socket "$SOCK" --warm --idle-timeout 240 \
  > "$T/server.log" 2>&1 &
SRV_PID=$!
for i in $(seq 1 600); do
  [ -S "$SOCK" ] && break
  kill -0 $SRV_PID 2>/dev/null || { echo "server died"; tail -20 "$T/server.log"; exit 1; }
  sleep 2
done
export UNIKMER_TPU_SERVER=$SOCK

rc() { local l=$1; shift; local t=$SECONDS
  PALLAS_AXON_POOL_IPS= UNIKMER_TPU_PLATFORM=cpu \
    python -m unikmer_tpu.cli.main "$@" 2> "$T/$l.err"
  local r=$?; echo "client[$l]: rc=$r wall=$((SECONDS - t))s"
  [ $r -ne 0 ] && tail -8 "$T/$l.err"; return $r; }

echo "=== device count (unstable sorts) ==="
export UNIKMER_TPU_HOST_COUNT=0
rc dcount count -k 23 -K -s "$OLD/Ecoli-MG1655.fasta.gz" -o "$T/mg_dev" || exit 1
D=$(bin/unikmer-tpu view "$T/mg_dev.unik" | md5sum | cut -d' ' -f1)
[ "$D" = "$MG_MD5" ] && echo "DEVICE-COUNT-UNSTABLE: EXACT" \
  || { echo "DEVICE-COUNT MISMATCH"; exit 1; }

echo "=== device taxid union (golden README fixture) ==="
export UNIKMER_TPU_DEVICE_TAXID=1
rc dunion union "$T/iai_host.unik" "$T/mg_host_t.unik" -s -o "$T/union_dev" || exit 1
U=$(bin/unikmer-tpu view -t "$T/union_dev.unik" | md5sum | cut -d' ' -f1)
[ "$U" = "$FIX_MD5" ] && echo "DEVICE-TAXID-UNION-UNSTABLE: EXACT (fixture)" \
  || { echo "UNION MISMATCH ($U)"; exit 1; }

echo "=== split3 hashed count -T (unstable) ==="
export UNIKMER_TPU_TAXID_STAGED=1
rc dminiT count -k 31 -s -T -r 'taxid\|(\d+)' "$T/mini_taxid.fa" -o "$T/miniT_dev" || exit 1
M=$(bin/unikmer-tpu view -t "$T/miniT_dev.unik" | md5sum | cut -d' ' -f1)
[ "$M" = "$MINI_MD5" ] && echo "SPLIT3-UNSTABLE: EXACT" \
  || { echo "SPLIT3 MISMATCH"; exit 1; }

unset UNIKMER_TPU_SERVER
wait $SRV_PID
echo "ALL ROUND-5B EXACTNESS CHECKS PASSED"
