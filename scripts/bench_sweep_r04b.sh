#!/bin/bash
# Round-4 sweep, part B: W4A16 experts (MMMM_BENCH_QUANT=4) — the VERDICT r3
# "never measured as the headline config" lever. W4 halves the decode-time
# weight stream vs W8 (the dominant per-step read: lang-expert QKVO+MLP) and
# frees ~2.8 GB of HBM, which may re-admit bf16 KV at B40+ (part-A result:
# bf16 KV wins per-byte 0.92-vs-0.33 bw-util over the q8 kernel, but B40+
# bf16 OOM'd under W8's 8 GB resident weights).
OUT=${OUT:-/root/repo/BENCH_SWEEP_r04b.jsonl}
cd /root/repo
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_QUANT=4 MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": $line}" >> "$OUT"
}
run b28-c0-bf16-w4  MMMM_BENCH_BATCH=28 MMMM_BENCH_PREFILL_CHUNK=0
run b40-c10-bf16-w4 MMMM_BENCH_BATCH=40 MMMM_BENCH_PREFILL_CHUNK=10
run b48-c12-bf16-w4 MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12
run b56-c8-int8-w4  MMMM_BENCH_BATCH=56 MMMM_BENCH_PREFILL_CHUNK=8 MMMM_BENCH_KV=int8
run b36-c0-bf16-w4  MMMM_BENCH_BATCH=36 MMMM_BENCH_PREFILL_CHUNK=0
echo "SWEEP DONE" >> "$OUT"
