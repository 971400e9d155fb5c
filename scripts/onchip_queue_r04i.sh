#!/bin/bash
# Round-4 queue, part I (relaunch after the VM restart killed parts f2/g/h):
#   1. decode-step bisect probe (attribute the 11 ms vs 6.5 ms analytic gap)
#   2. W8A8 serving A/B (BENCH_SWEEP_r04h rows — expectation after the fixed
#      qdot probe: W8A8 ~= W8A16, see ROADMAP)
#   3. full default bench -> BENCH_SELF_r04.json (proves the driver's
#      end-of-round `python bench.py` completes: the long + spec rows OOM'd
#      once before the buffer-freeing fix)
#   4. refinement rows around the B40-c10 winner (B44-c11, B40-c20)
set -u
cd /root/repo
OUT_SWEEP=/root/repo/BENCH_SWEEP_r04h.jsonl
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT_SWEEP}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$OUT_SWEEP"
}

MMMM_PROBE_B=40 python scripts/tpu_probes.py decodebisect \
  > PROBE_DECODE_r04.jsonl 2>>/tmp/probe_decode.log
echo "BISECT DONE" >> PROBE_DECODE_r04.jsonl

run b40-c10-bf16-w8a8 MMMM_W8A8=1 MMMM_BENCH_BATCH=40 MMMM_BENCH_PREFILL_CHUNK=10
run b28-c0-bf16-w8a8  MMMM_W8A8=1 MMMM_BENCH_BATCH=28 MMMM_BENCH_PREFILL_CHUNK=0

python bench.py > BENCH_SELF_r04.json 2>>/tmp/bench_self.log
echo "BENCH SELF DONE" >> /tmp/bench_self.log

run b44-c11-bf16 MMMM_BENCH_BATCH=44 MMMM_BENCH_PREFILL_CHUNK=11
run b40-c20-bf16 MMMM_BENCH_BATCH=40 MMMM_BENCH_PREFILL_CHUNK=20
echo "SWEEP DONE" >> "$OUT_SWEEP"
echo "QUEUE I DONE" >> "$OUT_SWEEP"
