#!/bin/bash
# Round-4 queue, part L: the in-place KV-append kernel A/B.
# PROBE_DECODE_r04 attributed ~4.4 ms of the 12.75 ms decode step at B40 to
# a full-cache copy XLA inserts around the vmapped-DUS scatter; the
# kv_append_pallas kernel (aligned 8-slot window + input_output_aliases)
# removes the scatter. Correctness gated on-chip by
# scripts/verify_kv_append.py (micro == DUS; decode tokens bit-identical).
# Control = queue I's b44-c11 @ 13.755 rep/s (MMMM_KV_APPEND did not exist
# then = DUS path).
#   1. b44-c11 append ON (the headline A/B)
#   2. b48-c12 append ON (decode got cheaper; probe the batch wall again)
#   3. b44-c11 append+unroll2 (does unroll still add anything on top?)
#   4. full default bench at the best of rows 1-3 -> BENCH_SELF_r04.json
#      (headline + 512-token long row + spec row; the long row retries the
#      earlier HTTP-500-killed attempt — the per-step copy scaled with Smax
#      so the append win should be larger there)
set -u
cd /root/repo
OUT=/root/repo/BENCH_SWEEP_r04l.jsonl
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$OUT"
}
run b44-c11-append           MMMM_BENCH_BATCH=44 MMMM_BENCH_PREFILL_CHUNK=11
run b48-c12-append           MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12
run b44-c11-append-unroll2   MMMM_DECODE_UNROLL=2 MMMM_BENCH_BATCH=44 MMMM_BENCH_PREFILL_CHUNK=11

# Row 4: pick the best A/B config, run the FULL default bench (headline +
# long + spec rows) and persist it as the round's self-reported artifact.
eval "$(python - <<'EOF'
import json
best, cfg = 0.0, {}
for line in open("/root/repo/BENCH_SWEEP_r04l.jsonl"):
    row = json.loads(line)
    res = row.get("res") or {}
    v = res.get("value", 0)
    if v > best:
        best = v
        tag = row["tag"]
        cfg = {
            "MMMM_BENCH_BATCH": tag.split("-")[0][1:],
            "MMMM_BENCH_PREFILL_CHUNK": tag.split("-")[1][1:],
            "MMMM_DECODE_UNROLL": "2" if "unroll2" in tag else "1",
        }
print("; ".join(f"export {k}={v}" for k, v in cfg.items()) or "true")
EOF
)"
echo "=== final default bench (B=${MMMM_BENCH_BATCH:-40} c${MMMM_BENCH_PREFILL_CHUNK:-10} u${MMMM_DECODE_UNROLL:-1}) ===" >&2
line=$(python bench.py 2>>"${OUT}.log" | tail -1)
echo "{\"tag\": \"final-default\", \"res\": ${line:-null}}" >> "$OUT"
if [ -n "${line:-}" ]; then echo "$line" > /root/repo/BENCH_SELF_r04.json; fi
echo "SWEEP DONE" >> "$OUT"
echo "QUEUE L DONE" >> "$OUT"
