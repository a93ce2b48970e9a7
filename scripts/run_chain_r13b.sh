#!/bin/bash
# One quiet sequential measurement chain on the final round-13 code
# (124-query registry): scaled fixtures -> SCALING -> PERF_FLOOR ->
# quiet bench -> parity artifact -> pytest artifact. Strictly
# back-to-back so no stage contends with another; each stage logs its
# start loadavg.
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

log "stage 2: PERF_FLOOR.json at the 124-query registry"
python scripts/perf_floor.py

log "stage 3: quiet bench (canonical detail, explicit opt-in)"
SPARK_GRAFT_DETAIL_OUT=BENCH_DETAIL.json python bench.py > /tmp/bench_r13b.json
cat /tmp/bench_r13b.json

log "stage 4: parity artifact at 124"
{
  echo "PARITY_r13 — full sf0.01 oracle-parity sweep (round 13, final: 124-query registry)"
  echo "Command: the verify-skill driver-contract loop (vanilla local[8] session,"
  echo "run_parity over every queries()/oracle_sql() pair at /root/testdata/sf0.01)."
  python scripts/run_parity.py /root/testdata/sf0.01 2>/dev/null | grep -v "WARN"
} > PARITY_r13.txt
tail -3 PARITY_r13.txt

log "stage 5: pytest artifact"
# check pytest's own exit code BEFORE overwriting the committed artifact
# (pipefail alone would still have clobbered it mid-pipe)
python -m pytest tests/ -q > /tmp/pytest_chain.txt 2>&1 || {
  tail -15 /tmp/pytest_chain.txt
  echo "pytest FAILED; leaving committed PYTEST artifact untouched" >&2
  exit 1
}
tail -40 /tmp/pytest_chain.txt > PYTEST_r13.txt
tail -2 PYTEST_r13.txt

log "chain done"
