#!/bin/bash
# Round-4 sweep, part H: W8A8 decode (MMMM_W8A8=1 — native int8 x int8 MXU
# matmuls with dynamic per-row activation scales in the lang-only decode
# branch). PROBE_QDOT_r04 showed the W8A16 dequant matmul capped at ~0.45 of
# roofline at decode M by the int8->bf16 retile; if the native dot reads
# int8 bytes at ~0.9 util, the decode step drops ~40% of its weight time.
OUT=${OUT:-/root/repo/BENCH_SWEEP_r04h.jsonl}
cd /root/repo
while ! grep -q "SWEEP DONE" BENCH_SWEEP_r04g.jsonl 2>/dev/null; do sleep 60; done
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": $line}" >> "$OUT"
}
run b40-c10-bf16-w8a8 MMMM_W8A8=1 MMMM_BENCH_BATCH=40 MMMM_BENCH_PREFILL_CHUNK=10
run b28-c0-bf16-w8a8  MMMM_W8A8=1 MMMM_BENCH_BATCH=28 MMMM_BENCH_PREFILL_CHUNK=0
echo "SWEEP DONE" >> "$OUT"
