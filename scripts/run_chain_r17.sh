#!/bin/bash
# One quiet sequential measurement chain on the final round-17 code
# (130-query registry; semdedup store append path + metadata channel +
# AUTO cell pruning + streaming semdedup). Stage order keeps the most
# scale-sensitive artifacts at the quietest moments (chain start), the
# r15/r16 protocol. Strictly back-to-back so no stage contends with
# another; each stage logs its start loadavg.
set -e
set -o pipefail
cd /root/repo
log() { echo "[chain $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)] $*"; }

log "stage 0: SCALING_SEMDEDUP_STORE.json (round-17 headline: store vs recompute + the NEW zero-rebuild append SEQUENCE, x1 x4 x16 x64)"
python scripts/scaling_semdedup_store.py 1 4 16 64

log "stage 1: decompose_q5 (VERDICT r16 #8: regional_supplier_volume slope-neutral classification check)"
python scripts/decompose_q5.py > Q5_DECOMP.json || log "q5 decomposition failed (non-fatal)"

log "stage 2: SEMDEDUP_INCR_RECALL.json (ingest-path quality grid + store==recompute check)"
python scripts/semdedup_incremental_recall.py

log "stage 3: rebuild scaled fixture series"
for k in 1 2 4 8; do
  python scripts/make_scaled.py $k
done

log "stage 4: SCALING.json regen (x1 x2 x4 x8)"
python scripts/scaling_curve.py testdata_scaled/x1 testdata_scaled/x2 testdata_scaled/x4 testdata_scaled/x8

log "stage 5: PERF_FLOOR.json at the 130-query registry (paired protocol: 3 interleaved suite passes)"
python scripts/perf_floor.py

log "stage 6: settle 150s, then quiet PAIRED bench (canonical detail)"
sleep 150
SPARK_GRAFT_DETAIL_OUT=BENCH_DETAIL.json python bench.py --paired > /tmp/bench_r17.json
cat /tmp/bench_r17.json

log "stage 7: parity artifact at 130"
{
  echo "PARITY_r17 — full sf0.01 oracle-parity sweep (round 17, final: 130-query registry,"
  echo "incl. semdedup_store_append — zero-rebuild multi-batch ingest — and"
  echo "semdedup_store_meta — the store's in-band metadata channel). Command: the"
  echo "verify-skill driver-contract loop (vanilla local[8] session, run_parity over every"
  echo "queries()/oracle_sql() pair at /root/testdata/sf0.01)."
  python scripts/run_parity.py /root/testdata/sf0.01 2>/dev/null | grep -v "WARN"
} > PARITY_r17.txt
tail -3 PARITY_r17.txt

log "stage 8: pytest artifact"
# check pytest's own exit code BEFORE overwriting the committed artifact
python -m pytest tests/ -q > /tmp/pytest_chain.txt 2>&1 || {
  tail -15 /tmp/pytest_chain.txt
  echo "pytest FAILED; leaving committed PYTEST artifact untouched" >&2
  exit 1
}
tail -40 /tmp/pytest_chain.txt > PYTEST_r17.txt
tail -2 PYTEST_r17.txt

log "chain done"
