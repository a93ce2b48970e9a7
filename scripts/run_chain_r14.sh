#!/bin/bash
# One quiet sequential measurement chain on the final round-14 code
# (125-query registry): scaled fixtures -> SCALING -> SCALING_SEMDEDUP
# -> PERF_FLOOR -> settle -> quiet bench -> parity artifact -> pytest
# artifact. Strictly back-to-back so no stage contends with another;
# each stage logs its start loadavg. The bench stage sleeps first: the
# 1-min loadavg gate does not protect against 5-min chain residue
# (BASELINE.md r13 note).
set -e
set -o pipefail
cd /root/repo
log() { echo "[chain $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)] $*"; }

log "stage 0: rebuild scaled fixture series"
for k in 1 2 4 8; do
  python scripts/make_scaled.py $k
done

log "stage 1: SCALING.json regen (x1 x2 x4 x8)"
python scripts/scaling_curve.py testdata_scaled/x1 testdata_scaled/x2 testdata_scaled/x4 testdata_scaled/x8

log "stage 1b: SCALING_SEMDEDUP.json regen (x1 x4 x16, final plans)"
python scripts/scaling_semdedup.py 1 4 16

log "stage 2: PERF_FLOOR.json at the 125-query registry"
python scripts/perf_floor.py

log "stage 3: settle 150s, then quiet bench (canonical detail, explicit opt-in)"
sleep 150
SPARK_GRAFT_DETAIL_OUT=BENCH_DETAIL.json python bench.py > /tmp/bench_r14.json
cat /tmp/bench_r14.json

log "stage 4: parity artifact at 125"
{
  echo "PARITY_r14 — full sf0.01 oracle-parity sweep (round 14, final: 125-query registry)"
  echo "Command: the verify-skill driver-contract loop (vanilla local[8] session,"
  echo "run_parity over every queries()/oracle_sql() pair at /root/testdata/sf0.01)."
  python scripts/run_parity.py /root/testdata/sf0.01 2>/dev/null | grep -v "WARN"
} > PARITY_r14.txt
tail -3 PARITY_r14.txt

log "stage 5: pytest artifact"
# check pytest's own exit code BEFORE overwriting the committed artifact
python -m pytest tests/ -q > /tmp/pytest_chain.txt 2>&1 || {
  tail -15 /tmp/pytest_chain.txt
  echo "pytest FAILED; leaving committed PYTEST artifact untouched" >&2
  exit 1
}
tail -40 /tmp/pytest_chain.txt > PYTEST_r14.txt
tail -2 PYTEST_r14.txt

log "chain done"
