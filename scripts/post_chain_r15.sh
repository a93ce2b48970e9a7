#!/bin/bash
# Post-chain idle-start re-measurements (round 15): the chain's own
# residue loaded the windows of three of its stages (the r14 lesson —
# loadavg gating does not fully capture a box still digesting the
# previous stage). This script waits for a GENUINELY idle start
# (1-min loadavg < 1, bounded wait) before each measurement:
#   1. SCALING_SEMDEDUP from idle (VERDICT r14 #6 asked start load <1;
#      the chain's stage-0 started at 1.24/7.9 — close but not <1).
#   2. Paired bench -> BENCH_DETAIL.json (the chain's paired spread
#      read 16.8-22.8s under 15-min load 7.28 — a marked-noisy window).
#   3. The three SCALING non-improvers re-measured interleaved
#      (funnel_stages, grouped_ols, product_profit_by_nation — all
#      untouched this round and improving in r14's quiet chain) ->
#      SCALING_subset_r15.json, never clobbering the full curve.
set -e
set -o pipefail
cd /root/repo
log() { echo "[post $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)] $*"; }
wait_idle() {
  for _ in $(seq 1 60); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" 'BEGIN{exit !(l < 1.0)}' && return 0
    sleep 15
  done
  log "idle wait expired; proceeding (loadavg gate records the truth)"
}

wait_idle; log "1: SCALING_SEMDEDUP idle regen (x1 x4 x16 x32)"
python scripts/scaling_semdedup.py 1 4 16 32

wait_idle; log "2: paired bench (canonical detail)"
SPARK_GRAFT_DETAIL_OUT=BENCH_DETAIL.json python bench.py --paired > /tmp/bench_r15b.json
cat /tmp/bench_r15b.json

wait_idle; log "3: scaling subset re-measure (3 non-improvers, interleaved protocol)"
SPARK_GRAFT_SCALING_ONLY=funnel_stages,grouped_ols,product_profit_by_nation \
SPARK_GRAFT_SCALING_OUT=SCALING_subset_r15.json \
python scripts/scaling_curve.py testdata_scaled/x1 testdata_scaled/x8

log "post-chain done"
