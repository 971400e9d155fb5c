#!/bin/bash
# Round-4 queue, part N (replaces M's tail): b52-c13 OOMed on-device, so
# B48 is the post-kv_append batch ceiling — b56/b64 rows were doomed
# compile-time wasters and were cut. Rows:
#   1. b48-c12 + ragged decode: the length-aware kernel's read saving is a
#      larger relative share now that the per-step copy is gone
#   2. b48-c12 + unroll2: decode-scan unroll was +0.2 rep/s at B44-on-append
#   3. full default bench at the best config across queues L+N
#      -> BENCH_SELF_r04.json (long row B16 unchunked, spec row B24,
#      leak-proofed failure paths)
#   4. serving stage decomposition at the winner config (probe_stages, one
#      stage per process — holding several compiled 6.5B stages OOMs)
set -u
cd /root/repo
OUT=/root/repo/BENCH_SWEEP_r04n.jsonl
run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$OUT"
}
run b48-c12-ragged   MMMM_RAGGED_DECODE=1 MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12
run b48-c12-unroll2  MMMM_DECODE_UNROLL=2 MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12

eval "$(python - <<'EOF'
import json, re
best, cfg = 0.0, {}
for path in ("/root/repo/BENCH_SWEEP_r04l.jsonl", "/root/repo/BENCH_SWEEP_r04n.jsonl"):
    try:
        rows = [json.loads(l) for l in open(path) if l.strip().startswith("{")]
    except FileNotFoundError:
        continue
    for row in rows:
        res = row.get("res") or {}
        v = res.get("value", 0)
        tag = row.get("tag", "")
        if not re.match(r"^b\d+-c\d+", tag):
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

# stage decomposition at the winner config, one stage per process
for s in vit prefill sam end_to_end; do
  python scripts/tpu_probes.py stages --only "$s" >> /root/repo/PROBE_STAGES_r04n.jsonl 2>>"${OUT}.log"
done
echo "SWEEP DONE" >> "$OUT"
echo "QUEUE N DONE" >> "$OUT"
