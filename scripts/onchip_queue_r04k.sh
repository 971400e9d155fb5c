#!/bin/bash
# Round-4 queue, part K (supersedes part J; queue I finished: b44-c11 is the
# winner at 13.755 rep/s, b40-c20=13.271 closed the chunk axis at ~B/4, and
# W8A8 measured slightly WORSE than W8A16 (13.37 vs 13.61 at b40-c10) so
# W8A16 stays the headline quant).
#   1. unroll A/B at the b44-c11 winner: MMMM_DECODE_UNROLL unrolls the
#      decode scan body (token-identical, verified on-chip) — tests whether
#      part of the ~12.75 ms-vs-6.5 ms decode-step gap is per-iteration
#      fixed cost.
#   2. b48-c12: one step further up the batch axis (the donation fix +
#      chunked prefill may have moved the OOM wall past 44).
#   3. full bench at b44-c11 WITH long + spec rows -> candidate for the
#      default config (also retries the long-decode row that died on a
#      remote-compile 500 in BENCH_SELF_r04.json).
set -u
cd /root/repo
OUT=/root/repo/BENCH_SWEEP_r04k.jsonl
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$OUT"
}
run b44-c11-unroll2  MMMM_DECODE_UNROLL=2 MMMM_BENCH_BATCH=44 MMMM_BENCH_PREFILL_CHUNK=11
run b44-c11-unroll4  MMMM_DECODE_UNROLL=4 MMMM_BENCH_BATCH=44 MMMM_BENCH_PREFILL_CHUNK=11
run b48-c12          MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12
echo "SWEEP DONE" >> "$OUT"
# Full default-shaped run (long + spec rows ON) at the b44-c11 candidate.
env MMMM_BENCH_BATCH=44 MMMM_BENCH_PREFILL_CHUNK=11 \
  python bench.py > /root/repo/BENCH_SELF_r04_b44.json 2>>/tmp/bench_self.log
echo "BENCH SELF B44 DONE" >> "$OUT"
echo "QUEUE K DONE" >> "$OUT"
