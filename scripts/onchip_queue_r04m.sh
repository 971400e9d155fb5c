#!/bin/bash
# Round-4 queue, part M: post-kv_append frontier. Queue L verdicts:
# b44-c11 16.60, b48-c12 16.93 (the old B44 wall moved — the per-step copy
# WAS the binding transient), unroll2 on top of append +0.2 at B44.
# Rows:
#   1. b52-c13 / 2. b56-c14 / 4. b64-c16 — walk the batch wall
#   3. b48-c12 + ragged decode: the length-aware kernel's read saving is a
#      larger relative win now that the copy is gone (last A/B predates it)
#   5. full default bench at the best config across queues L+M
#      -> BENCH_SELF_r04.json (long row now B16 unchunked: the B28 c12
#      chunked-prefill long program padded to B36 and twice hit the remote
#      compiler memory ceiling)
# Waits for the chained q8 verify (run after queue L) before touching the
# chip.
set -u
cd /root/repo
while [ ! -f /tmp/verify_q8.out ] || ! grep -q "exit=" /tmp/verify_q8.out; do sleep 60; done
OUT=/root/repo/BENCH_SWEEP_r04m.jsonl
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$OUT"
}
run b52-c13         MMMM_BENCH_BATCH=52 MMMM_BENCH_PREFILL_CHUNK=13
run b56-c14         MMMM_BENCH_BATCH=56 MMMM_BENCH_PREFILL_CHUNK=14
run b48-c12-ragged  MMMM_RAGGED_DECODE=1 MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12
run b64-c16         MMMM_BENCH_BATCH=64 MMMM_BENCH_PREFILL_CHUNK=16

# Final: best config across L+M rows -> full default bench (headline + long
# + spec rows), persisted as the round's self-reported artifact.
eval "$(python - <<'EOF'
import json, re
best, cfg = 0.0, {}
for path in ("/root/repo/BENCH_SWEEP_r04l.jsonl", "/root/repo/BENCH_SWEEP_r04m.jsonl"):
    try:
        rows = [json.loads(l) for l in open(path) if l.strip().startswith("{")]
    except FileNotFoundError:
        continue
    for row in rows:
        res = row.get("res") or {}
        v = res.get("value", 0)
        tag = row.get("tag", "")
        if not re.match(r"^b\d+-c\d+", tag):  # skip final-default rows
            continue
        if v and v > best:
            best = v
            parts = tag.split("-")
            cfg = {
                "MMMM_BENCH_BATCH": parts[0][1:],
                "MMMM_BENCH_PREFILL_CHUNK": parts[1][1:],
                "MMMM_DECODE_UNROLL": "2" if "unroll2" in tag else "1",
                "MMMM_RAGGED_DECODE": "1" if "ragged" in tag else "0",
            }
print("; ".join(f"export {k}={v}" for k, v in cfg.items()) or "true")
EOF
)"
echo "=== final default bench (B=${MMMM_BENCH_BATCH:-48} c${MMMM_BENCH_PREFILL_CHUNK:-12} ragged=${MMMM_RAGGED_DECODE:-0} unroll=${MMMM_DECODE_UNROLL:-1}) ===" >&2
line=$(python bench.py 2>>"${OUT}.log" | tail -1)
echo "{\"tag\": \"final-default\", \"res\": ${line:-null}}" >> "$OUT"
if [ -n "${line:-}" ]; then echo "$line" > /root/repo/BENCH_SELF_r04.json; fi
echo "SWEEP DONE" >> "$OUT"
echo "QUEUE M DONE" >> "$OUT"
