#!/bin/bash
# One quiet sequential measurement chain on the final round-16 code
# (128-query registry; persisted semdedup store + owned checkpoint
# lifetimes + paired PERF_FLOOR). Stage order keeps the most
# scale-sensitive artifacts at the quietest moments (chain start), the
# r15 protocol. Strictly back-to-back so no stage contends with
# another; each stage logs its start loadavg.
set -e
set -o pipefail
cd /root/repo
log() { echo "[chain $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)] $*"; }

log "stage 0: SCALING_SEMDEDUP_STORE.json (round-16 headline: store vs recompute, fixed batch, x1 x4 x16 x64)"
python scripts/scaling_semdedup_store.py 1 4 16 64

log "stage 1: SCALING_SEMDEDUP.json regen (x1 x4 x16 x32 — two-level internals refactored this round; prove no regression)"
python scripts/scaling_semdedup.py 1 4 16 32

log "stage 2: SEMDEDUP_INCR_RECALL.json (ingest-path quality grid + store==recompute check)"
python scripts/semdedup_incremental_recall.py

log "stage 3: decompose_q13 (VERDICT r15 #8 stretch; interleaved A/B, self-defending)"
python scripts/decompose_q13.py > Q13_DECOMP.json || log "q13 decomposition failed (non-fatal)"

log "stage 4: rebuild scaled fixture series"
for k in 1 2 4 8; do
  python scripts/make_scaled.py $k
done

log "stage 5: SCALING.json regen (x1 x2 x4 x8)"
python scripts/scaling_curve.py testdata_scaled/x1 testdata_scaled/x2 testdata_scaled/x4 testdata_scaled/x8

log "stage 6: PERF_FLOOR.json at the 128-query registry (NEW paired protocol: 3 interleaved suite passes)"
python scripts/perf_floor.py

log "stage 7: settle 150s, then quiet PAIRED bench (canonical detail)"
sleep 150
SPARK_GRAFT_DETAIL_OUT=BENCH_DETAIL.json python bench.py --paired > /tmp/bench_r16.json
cat /tmp/bench_r16.json

log "stage 8: parity artifact at 128"
{
  echo "PARITY_r16 — full sf0.01 oracle-parity sweep (round 16, final: 128-query registry,"
  echo "incl. semdedup_incremental_store — the persisted-store ingest path). Command: the"
  echo "verify-skill driver-contract loop (vanilla local[8] session, run_parity over every"
  echo "queries()/oracle_sql() pair at /root/testdata/sf0.01)."
  python scripts/run_parity.py /root/testdata/sf0.01 2>/dev/null | grep -v "WARN"
} > PARITY_r16.txt
tail -3 PARITY_r16.txt

log "stage 9: pytest artifact"
# check pytest's own exit code BEFORE overwriting the committed artifact
python -m pytest tests/ -q > /tmp/pytest_chain.txt 2>&1 || {
  tail -15 /tmp/pytest_chain.txt
  echo "pytest FAILED; leaving committed PYTEST artifact untouched" >&2
  exit 1
}
tail -40 /tmp/pytest_chain.txt > PYTEST_r16.txt
tail -2 PYTEST_r16.txt

log "chain done"
