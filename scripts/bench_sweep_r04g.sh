#!/bin/bash
# Round-4 sweep, part G: refine around the part-C winner (B40-c10-bf16 =
# 13.50 rep/s): can bf16 KV stretch to B44, and does a larger prefill chunk
# (fewer lax.map steps) pay at B40?
OUT=${OUT:-/root/repo/BENCH_SWEEP_r04g.jsonl}
cd /root/repo
while ! grep -q "BENCH SELF DONE" /tmp/bench_self.log 2>/dev/null; do sleep 60; done
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": $line}" >> "$OUT"
}
run b44-c11-bf16 MMMM_BENCH_BATCH=44 MMMM_BENCH_PREFILL_CHUNK=11
run b40-c20-bf16 MMMM_BENCH_BATCH=40 MMMM_BENCH_PREFILL_CHUNK=20
echo "SWEEP DONE" >> "$OUT"
