#!/bin/bash
# Round-4 sweep, part C: the single-program chunked prefill (lax.map inside
# the jitted stage — zero per-chunk dispatch tax, in-program aliasing). Part A
# measured the three-program version losing to B28-fused on dispatch overhead
# and OOM'ing bf16 KV at B40+; this re-tests the frontier with the tax gone.
OUT=${OUT:-/root/repo/BENCH_SWEEP_r04c.jsonl}
cd /root/repo
while ! grep -q "QUEUE B DONE" PROBE_STAGES_r04.jsonl 2>/dev/null; do sleep 60; done
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": $line}" >> "$OUT"
}
run b36-c12-bf16 MMMM_BENCH_BATCH=36 MMMM_BENCH_PREFILL_CHUNK=12
run b40-c10-bf16 MMMM_BENCH_BATCH=40 MMMM_BENCH_PREFILL_CHUNK=10
run b48-c12-int8 MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12 MMMM_BENCH_KV=int8
run b56-c8-int8  MMMM_BENCH_BATCH=56 MMMM_BENCH_PREFILL_CHUNK=8  MMMM_BENCH_KV=int8
echo "SWEEP DONE" >> "$OUT"
