#!/bin/bash
# Round-4 queue P+Q relaunch. The 01:00Z relay outage killed queue O's tail
# and would have burned the original P/Q chains one 1800 s timeout per step;
# this combined queue front-gates on relay recovery indefinitely, exports a
# 3 h per-step outage allowance, and runs the highest-value rows first:
#   1. B48 stage table (vit/sam rows, one compiled program per process)
#   2. prefill bisect (gelu / vit-attn / patch-embed / vit / llm ablations)
#   3. serving-knob A/Bs: vit-only chunking, SAM bf16, both stacked
#   4. 512-token long-row bisect (remote-compiler ceiling attribution)
#   5. flagship (6.5b) train gauge B2 -> B4
# Deferred rows (unroll4, c16 chunk scaling, train B16) live in the tail
# queue so they can be cancelled if the bisect surfaces better experiments.
set -u
cd /root/repo
export MMMM_BENCH_WAIT=10800

# per-step gate: never start a timed chip row while the host runs the test
# suite (1-core contention corrupts every wall-clock measurement)
gate() { while [ -f /tmp/suite_running ]; do sleep 60; done; }

# indefinite relay-recovery gate: backend init HANGS during outages, so the
# probe runs under timeout; 300 s covers a slow-but-alive init.
until timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  sleep 120
done
echo "relay back: $(date -u +%FT%TZ)" >&2

OUT=/root/repo/PROBE_PREFILL_r04.jsonl

for s in vit sam; do
  gate
  python scripts/tpu_probes.py stages --only "$s" >> "$OUT" 2>>"$OUT.log"
done

gate
python scripts/tpu_probes.py prefillbisect >> "$OUT" 2>>"$OUT.log"
echo "QUEUE P DONE" >> "$OUT"

QOUT=/root/repo/BENCH_SWEEP_r04q.jsonl
run() {
  gate
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${QOUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$QOUT"
}
B="MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12 MMMM_DECODE_UNROLL=2"
run b48-c12-u2-vitchunk   $B MMMM_PREFILL_CHUNK_MODE=vit
run b48-c12-u2-sambf16    $B MMMM_SAM_BF16=1
run b48-c12-u2-vit-sam    $B MMMM_PREFILL_CHUNK_MODE=vit MMMM_SAM_BF16=1

gate
python scripts/probe_long512.py >> "${QOUT}.log" 2>&1

gate
python scripts/bench_train.py --config 6.5b --remat attn --batch 2 --seq 1024 \
  >> /root/repo/BENCH_TRAIN_r04.jsonl 2>>"${QOUT}.log"
if tail -1 /root/repo/BENCH_TRAIN_r04.jsonl | grep -q 'train_tokens_per_sec_6.5b'; then
  gate
  python scripts/bench_train.py --config 6.5b --remat attn --batch 4 --seq 1024 \
    >> /root/repo/BENCH_TRAIN_r04.jsonl 2>>"${QOUT}.log"
fi

echo "SWEEP DONE" >> "$QOUT"
echo "QUEUE PQ DONE" >> "$QOUT"
