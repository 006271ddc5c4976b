#!/bin/bash
# Round-5 chip session P2: resident device server evidence (VERDICT
# round-4 next #3) + split3 hashed count -T end-to-end (next #2).
#
# DEVICE DISCIPLINE (CLAUDE.md): exactly ONE device process alive at a
# time (the server); clients are jax-free.  Never external-`timeout` or
# kill a device process — a killed pending op wedges the chip ~45 min.
# Run inside tmux.
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
export UNIKMER_DB=/root/repo/tests/data/taxdump
T=${1:-/tmp/chip_round5}
OLD=/root/reference/testdata/old
SOCK=$T/unikmer.sock
LOG=$T/server.log
mkdir -p "$T"
[ -n "${PALLAS_AXON_POOL_IPS:-}" ] || { echo "PALLAS_AXON_POOL_IPS not set"; exit 1; }

echo "=== host oracles (jax-free) ==="
# hashed count -T oracle (k=31 ntHash — the UNPACKABLE config)
{ zcat "$OLD/Ecoli-IAI39.fasta.gz"  | sed 's/^>\(.*\)/>\1 taxid|585057/';
  zcat "$OLD/Ecoli-MG1655.fasta.gz" | sed 's/^>\(.*\)/>\1 taxid|511145/';
} > "$T/both_taxid.fa"
head -c 2500000 "$T/both_taxid.fa" > /dev/null  # warm page cache
{ zcat "$OLD/Ecoli-IAI39.fasta.gz"  | head -8000 | sed 's/^>\(.*\)/>\1 taxid|585057/';
  zcat "$OLD/Ecoli-MG1655.fasta.gz" | head -8000 | sed 's/^>\(.*\)/>\1 taxid|511145/';
} > "$T/mini_taxid.fa"

UNIKMER_TPU_HOST_COUNT=1 UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu \
  count -k 31 -s -T -r 'taxid\|(\d+)' "$T/mini_taxid.fa" -o "$T/miniT_host"
MINI_MD5=$(bin/unikmer-tpu view -t "$T/miniT_host.unik" | md5sum | cut -d' ' -f1)
UNIKMER_TPU_HOST_COUNT=1 UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu \
  count -k 31 -s -T -r 'taxid\|(\d+)' "$T/both_taxid.fa" -o "$T/fullT_host"
FULL_MD5=$(bin/unikmer-tpu view -t "$T/fullT_host.unik" | md5sum | cut -d' ' -f1)
# plain device-count oracle (k=23 MG1655 — server warm-request timing)
UNIKMER_TPU_DEVICE_TAXID=0 bin/unikmer-tpu count -k 23 -K -s \
  "$OLD/Ecoli-MG1655.fasta.gz" -o "$T/mg_host"
MG_MD5=$(bin/unikmer-tpu view "$T/mg_host.unik" | md5sum | cut -d' ' -f1)
echo "oracles: miniT=$MINI_MD5 fullT=$FULL_MD5 mg=$MG_MD5"

echo "=== starting resident server (pretouch absorbs the warm-up stall) ==="
t0=$SECONDS
python -m unikmer_tpu.server --socket "$SOCK" --pretouch \
  --idle-timeout 300 > "$LOG" 2>&1 &
SRV_PID=$!
# wait for the socket (pretouch can ride out the 8-9 min stall)
for i in $(seq 1 900); do
  [ -S "$SOCK" ] && break
  kill -0 $SRV_PID 2>/dev/null || { echo "server died"; tail -20 "$LOG"; exit 1; }
  sleep 2
done
[ -S "$SOCK" ] || { echo "server socket never appeared"; tail -20 "$LOG"; exit 1; }
echo "server ready in $((SECONDS - t0)) s (incl. dial+warm+pretouch)"
grep -E "session warm|pre-touch" "$LOG" || true
export UNIKMER_TPU_SERVER=$SOCK

run_client() { # label, then argv...
  local label=$1; shift
  local t=$SECONDS
  # clients are jax-free: clear the relay pool so interpreter start is
  # 0.44 s, and pin cpu so a fallback-local run (dead server) cannot
  # hit the unregistered-axon tripwire
  PALLAS_AXON_POOL_IPS= UNIKMER_TPU_PLATFORM=cpu \
    python -m unikmer_tpu.cli.main "$@" 2> "$T/$label.err"
  local rc=$?
  echo "client[$label]: rc=$rc wall=$((SECONDS - t))s"
  [ $rc -ne 0 ] && tail -10 "$T/$label.err"
  return $rc
}

echo "=== warm-request evidence (VERDICT #3 done-criterion) ==="
export UNIKMER_TPU_HOST_COUNT=0   # force the device engine in-server
run_client count1 count -k 23 -K -s "$OLD/Ecoli-MG1655.fasta.gz" \
  -o "$T/mg_dev1" || exit 1
run_client count2 count -k 23 -K -s "$OLD/Ecoli-MG1655.fasta.gz" \
  -o "$T/mg_dev2" || exit 1
D1=$(bin/unikmer-tpu view "$T/mg_dev1.unik" | md5sum | cut -d' ' -f1)
D2=$(bin/unikmer-tpu view "$T/mg_dev2.unik" | md5sum | cut -d' ' -f1)
[ "$D1" = "$MG_MD5" ] && [ "$D2" = "$MG_MD5" ] \
  && echo "SERVER-COUNT: EXACT (both)" || { echo "SERVER-COUNT: MISMATCH"; }

echo "=== split3 hashed count -T: MINI (2^23 program) ==="
export UNIKMER_TPU_TAXID_SORT=split3 UNIKMER_TPU_TAXID_STAGED=1
export UNIKMER_TPU_DEVICE_TAXID=1
run_client miniT count -k 31 -s -T -r 'taxid\|(\d+)' --verbose \
  "$T/mini_taxid.fa" -o "$T/miniT_dev" \
  || { echo "mini split3 FAILED"; tail -30 "$T/miniT.err"; exit 1; }
MD=$(bin/unikmer-tpu view -t "$T/miniT_dev.unik" | md5sum | cut -d' ' -f1)
[ "$MD" = "$MINI_MD5" ] && echo "SPLIT3-MINI: EXACT" \
  || { echo "SPLIT3-MINI: MISMATCH ($MD vs $MINI_MD5)"; exit 1; }

echo "=== split3 hashed count -T: FULL (2^24 program — new compile) ==="
run_client fullT count -k 31 -s -T -r 'taxid\|(\d+)' --verbose \
  "$T/both_taxid.fa" -o "$T/fullT_dev" \
  || { echo "full split3 FAILED"; tail -30 "$T/fullT.err"; exit 1; }
FD=$(bin/unikmer-tpu view -t "$T/fullT_dev.unik" | md5sum | cut -d' ' -f1)
[ "$FD" = "$FULL_MD5" ] && echo "SPLIT3-FULL: EXACT (COUNT-T-HASHED)" \
  || { echo "SPLIT3-FULL: MISMATCH ($FD vs $FULL_MD5)"; exit 1; }
unset UNIKMER_TPU_TAXID_SORT UNIKMER_TPU_TAXID_STAGED
unset UNIKMER_TPU_DEVICE_TAXID

echo "=== third warm count (post-heavy-work server health) ==="
run_client count3 count -k 23 -K -s "$OLD/Ecoli-MG1655.fasta.gz" \
  -o "$T/mg_dev3" || exit 1
D3=$(bin/unikmer-tpu view "$T/mg_dev3.unik" | md5sum | cut -d' ' -f1)
[ "$D3" = "$MG_MD5" ] && echo "SERVER-COUNT-3: EXACT"

echo "=== shutting down server (idle timeout will reap it; waiting) ==="
unset UNIKMER_TPU_SERVER
# do NOT kill: let the idle timeout exit it cleanly (no pending op risk)
wait $SRV_PID
echo "server exited rc=$?"
echo "ALL ROUND-5 P2 CHIP VALIDATIONS PASSED"
