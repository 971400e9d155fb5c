#!/bin/bash
# Round-4 queue, part O (optional tail, run after queue N + the test suite):
# with decode ~21% faster per step, PREFILL is now roughly half the batch
# wall-clock, and its MXU utilization depends on the chunk size — c12 was
# tuned when chunking existed only to dodge transients. Rows:
#   1. b48-c16: 3 chunks; transients 4/3x of c12 (b52 = +4 full samples
#      OOMed; +4 chunk-only rows is much less residency — worth probing)
#   2. b48-c24: 2 chunks (skipped automatically if c16 OOMs: c24 strictly
#      bigger transients)
#   3. train-throughput scaling: 1.4B remat=attn at B16 (9760 tok/s at B8
#      was read-bound; doubling batch amortizes the reads)
# Waits for queue N's sentinel so the chip never runs two timed jobs.
set -u
cd /root/repo
while ! grep -q "QUEUE N DONE" /root/repo/BENCH_SWEEP_r04n.jsonl 2>/dev/null; do sleep 60; done
# also wait out the post-N test-suite window if one is running
while [ -f /tmp/suite_running ]; do sleep 60; done
OUT=/root/repo/BENCH_SWEEP_r04o.jsonl
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$OUT"
}
run b48-c16  MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=16
if tail -1 "$OUT" | grep -q '"res": null'; then
  echo '{"tag": "b48-c24", "res": null, "skipped": "c16 failed; c24 has strictly bigger transients"}' >> "$OUT"
else
  run b48-c24  MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=24
fi
python scripts/bench_train.py --remat attn --batch 16 >> /root/repo/BENCH_TRAIN_r04.jsonl 2>>"${OUT}.log"
echo "SWEEP DONE" >> "$OUT"
echo "QUEUE O DONE" >> "$OUT"
