#!/bin/bash
# Round-4 serving frontier sweep, attempt 3 (VERDICT r3 next-step #1).
# HBM budget on one v5e (16 GB): W8A16 weights ~8 GB fixed, so large decode
# batches need int8 KV (capacity, as ROADMAP predicted) + uint8 grounding
# images + chunked prefill bounding the ViT transients.
OUT=${OUT:-/root/repo/BENCH_SWEEP_r04.jsonl}
cd /root/repo
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": $line}" >> "$OUT"
}
run b48-c8-int8    MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=8  MMMM_BENCH_KV=int8
run b40-c10-bf16   MMMM_BENCH_BATCH=40 MMMM_BENCH_PREFILL_CHUNK=10
run b56-c8-int8    MMMM_BENCH_BATCH=56 MMMM_BENCH_PREFILL_CHUNK=8  MMMM_BENCH_KV=int8
run b48-c12-int8   MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12 MMMM_BENCH_KV=int8
echo "SWEEP DONE" >> "$OUT"
