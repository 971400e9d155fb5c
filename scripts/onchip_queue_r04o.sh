#!/bin/bash
# Round-4 queue, part O: long-row bisect + prefill-chunk scaling + train B16.
# Waits for queue N's sentinel AND the post-N test-suite window
# (/tmp/suite_running) so the chip never runs two timed jobs and suite CPU
# contention never corrupts timings.
set -u
cd /root/repo
while ! grep -q "QUEUE N DONE" /root/repo/BENCH_SWEEP_r04n.jsonl 2>/dev/null; do sleep 60; done
while [ -f /tmp/suite_running ]; do sleep 60; done
OUT=/root/repo/BENCH_SWEEP_r04o.jsonl

# 1. the 512-token long-decode bisect (first compiling config wins)
python scripts/probe_long512.py >> "$OUT.log" 2>&1

run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$OUT"
}
# 2. prefill-chunk scaling at the winner batch (prefill is now ~half the
#    wall; c12 was tuned when chunking existed only to dodge transients)
run b48-c16-unroll2  MMMM_DECODE_UNROLL=2 MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=16
if tail -1 "$OUT" | grep -q '"res": null'; then
  echo '{"tag": "b48-c24-unroll2", "res": null, "skipped": "c16 failed; c24 has strictly bigger transients"}' >> "$OUT"
else
  run b48-c24-unroll2  MMMM_DECODE_UNROLL=2 MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=24
fi
# 3. train-throughput batch scaling (B8 was read-bound at 9760 tok/s)
python scripts/bench_train.py --remat attn --batch 16 >> /root/repo/BENCH_TRAIN_r04.jsonl 2>>"${OUT}.log"
echo "SWEEP DONE" >> "$OUT"
echo "QUEUE O DONE" >> "$OUT"
