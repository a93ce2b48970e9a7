#!/bin/bash
# Post-chain idle-start re-measurements (round 17, r15/r16 protocol):
# the chain's own residue loads the windows of its interior stages —
# the round's headline artifacts get a genuinely idle (1-min loadavg
# < 1, bounded wait) re-measurement:
#   1. SCALING_SEMDEDUP_STORE from idle (the round-17 headline: the
#      append-sequence section rides in the same artifact).
#   2. Paired bench -> BENCH_DETAIL.json (canonical paired medians).
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

wait_idle; log "1: SCALING_SEMDEDUP_STORE idle regen (x1 x4 x16 x64)"
python scripts/scaling_semdedup_store.py 1 4 16 64

wait_idle; log "2: paired bench idle -> BENCH_DETAIL.json"
SPARK_GRAFT_DETAIL_OUT=BENCH_DETAIL.json python bench.py --paired > /tmp/bench_r17_idle.json
cat /tmp/bench_r17_idle.json

log "post-chain done"
