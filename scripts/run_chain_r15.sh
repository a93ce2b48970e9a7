#!/bin/bash
# One quiet sequential measurement chain on the final round-15 code
# (127-query registry, two-level semantic_dedup + cell profile): SCALING_SEMDEDUP
# FIRST (VERDICT r14 #6 — the r14 artifact started at loadavg 12.9
# because it ran mid-chain; the chain start is the quietest moment and
# the fixture build that precedes its measurements is light) -> scaled
# fixtures -> SCALING -> PERF_FLOOR -> settle -> quiet PAIRED bench ->
# parity artifact -> pytest artifact. Strictly back-to-back so no stage
# contends with another; each stage logs its start loadavg.
set -e
set -o pipefail
cd /root/repo
log() { echo "[chain $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)] $*"; }

log "stage 0: SCALING_SEMDEDUP.json regen at quiet chain start (x1 x4 x16 x32)"
python scripts/scaling_semdedup.py 1 4 16 32

log "stage 1: rebuild scaled fixture series"
for k in 1 2 4 8; do
  python scripts/make_scaled.py $k
done

log "stage 2: SCALING.json regen (x1 x2 x4 x8; 65 queries incl. bigram_repetition)"
python scripts/scaling_curve.py testdata_scaled/x1 testdata_scaled/x2 testdata_scaled/x4 testdata_scaled/x8

log "stage 3: PERF_FLOOR.json at the 127-query registry"
python scripts/perf_floor.py

log "stage 4: settle 150s, then quiet PAIRED bench (canonical detail, explicit opt-in)"
sleep 150
SPARK_GRAFT_DETAIL_OUT=BENCH_DETAIL.json python bench.py --paired > /tmp/bench_r15.json
cat /tmp/bench_r15.json

log "stage 5: parity artifact at 127"
{
  echo "PARITY_r15 — full sf0.01 oracle-parity sweep (round 15, final: 127-query registry,"
  echo "two-level semantic_dedup). Command: the verify-skill driver-contract loop (vanilla"
  echo "local[8] session, run_parity over every queries()/oracle_sql() pair at /root/testdata/sf0.01)."
  python scripts/run_parity.py /root/testdata/sf0.01 2>/dev/null | grep -v "WARN"
} > PARITY_r15.txt
tail -3 PARITY_r15.txt

log "stage 6: pytest artifact"
# check pytest's own exit code BEFORE overwriting the committed artifact
python -m pytest tests/ -q > /tmp/pytest_chain.txt 2>&1 || {
  tail -15 /tmp/pytest_chain.txt
  echo "pytest FAILED; leaving committed PYTEST artifact untouched" >&2
  exit 1
}
tail -40 /tmp/pytest_chain.txt > PYTEST_r15.txt
tail -2 PYTEST_r15.txt

log "chain done"
