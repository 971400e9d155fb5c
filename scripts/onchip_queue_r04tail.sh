#!/bin/bash
# Round-4 tail queue: deferred low-priority rows behind queue PQ. Cancel
# freely if the prefill bisect surfaces higher-value experiments.
#   - decode unroll=4 on the headline config (unroll=2 bought +2.6%)
#   - b48-c16 prefill-chunk scaling row (lost to the queue-O outage)
#   - 1.4b train gauge at B16 (queue-O row lost to the same outage)
set -u
cd /root/repo
export MMMM_BENCH_WAIT=10800
while ! grep -q "QUEUE PQ DONE" /root/repo/BENCH_SWEEP_r04q.jsonl 2>/dev/null; do sleep 120; done

gate() { while [ -f /tmp/suite_running ]; do sleep 60; done; }

QOUT=/root/repo/BENCH_SWEEP_r04q.jsonl
run() {
  gate
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${QOUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$QOUT"
}
run b48-c12-unroll4 MMMM_DECODE_UNROLL=4 MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12
run b48-c16-unroll2 MMMM_DECODE_UNROLL=2 MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=16

gate
python scripts/bench_train.py --remat attn --batch 16 --seq 1024 \
  >> /root/repo/BENCH_TRAIN_r04.jsonl 2>>"${QOUT}.log"

echo "TAIL DONE" >> "$QOUT"
