#!/bin/bash
# Round-5 queue A — drain VERDICT r4's measurement debt, highest value first.
# Every row runs in its OWN process (an OOM loses one row, not the queue) and
# retries once after a relay-recovery wait (VERDICT r4 weak #6).
#   1. prefill bisect at B48, one ablation variant per process (VERDICT #1)
#   2. SAM stage row (died RESOURCE_EXHAUSTED in r4), B48 then B28 fallback
#   3. qdot at prefill M=2304: the int8-prefill-matmul verdict (VERDICT #1b)
#   4. serving-knob A/Bs: vit-only chunking, SAM bf16, both (VERDICT #1a)
#   5. 512-token long-row bisect (VERDICT #2 / #7)
#   6. flagship 6.5b train gauge B2 -> B4 (VERDICT #4)
set -u
cd /root/repo
export MMMM_BENCH_WAIT=10800

# never start a timed chip row while the host runs the test suite (1 core)
gate() { while [ -f /tmp/suite_running ]; do sleep 60; done; }
# backend init HANGS during relay outages; poll under timeout until it's back
relay() {
  until timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    sleep 120
  done
}

# row <log> <out> cmd... : run one measurement in its own process, one retry
row() {
  local log=$1 rout=$2; shift 2
  gate; relay
  if ! "$@" >> "$rout" 2>>"$log"; then
    echo "RETRY($(date -u +%FT%TZ)): $*" >> "$log"
    sleep 180; gate; relay
    "$@" >> "$rout" 2>>"$log" || echo "FAILED: $*" >> "$log"
  fi
}

POUT=/root/repo/PROBE_PREFILL_r05.jsonl

for v in full nogelu novitattn nopatch novit nollmattn nollm; do
  row "$POUT.log" "$POUT" env MMMM_PROBE_VARIANT=$v \
    python scripts/tpu_probes.py prefillbisect
done
echo '{"mark": "bisect done"}' >> "$POUT"

row "$POUT.log" "$POUT" python scripts/tpu_probes.py stages --only sam
grep -q '"stage": "sam"' "$POUT" || \
  row "$POUT.log" "$POUT" env MMMM_BENCH_BATCH=28 \
    python scripts/tpu_probes.py stages --only sam

row "$POUT.log" "$POUT" env MMMM_PROBE_M=2304 python scripts/tpu_probes.py qdot

QOUT=/root/repo/BENCH_SWEEP_r05a.jsonl
brow() {
  local tag=$1; shift
  gate; relay
  echo "=== $tag $(date -u +%FT%TZ) ===" >> "${QOUT}.log"
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py \
         2>>"${QOUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$QOUT"
}
B="MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12 MMMM_DECODE_UNROLL=2"
brow b48-c12-u2-vitchunk $B MMMM_PREFILL_CHUNK_MODE=vit
brow b48-c12-u2-sambf16  $B MMMM_SAM_BF16=1
brow b48-c12-u2-vit-sam  $B MMMM_PREFILL_CHUNK_MODE=vit MMMM_SAM_BF16=1

row "${QOUT}.log" "${QOUT}.long512" python scripts/probe_long512.py

TOUT=/root/repo/BENCH_TRAIN_r05.jsonl
row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 6.5b \
  --remat attn --batch 2 --seq 1024
if tail -1 "$TOUT" 2>/dev/null | grep -q 'train_tokens_per_sec_6.5b'; then
  row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 6.5b \
    --remat attn --batch 4 --seq 1024
fi

echo "QUEUE R05A DONE" >> "$QOUT"
