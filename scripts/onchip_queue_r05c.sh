#!/bin/bash
# Round-5 queue C — after queue B: the train-step bisect (one variant per
# process) and the fast-softmax serving A/B.
set -u
cd /root/repo

until grep -q "QUEUE R05B DONE" SPEC_KERNELS_r05.log 2>/dev/null; do sleep 120; done
export MMMM_BENCH_WAIT=10800

gate() { while [ -f /tmp/suite_running ]; do sleep 60; done; }
relay() {
  until timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    sleep 120
  done
}
row() {
  local log=$1 rout=$2; shift 2
  gate; relay
  if ! "$@" >> "$rout" 2>>"$log"; then
    echo "RETRY($(date -u +%FT%TZ)): $*" >> "$log"
    sleep 180; gate; relay
    "$@" >> "$rout" 2>>"$log" || echo "FAILED: $*" >> "$log"
  fi
}

TOUT=/root/repo/PROBE_TRAINBISECT_r05.jsonl
for v in full novit noattn nollmattn noce; do
  row "$TOUT.log" "$TOUT" env MMMM_PROBE_VARIANT=$v \
    python scripts/tpu_probes.py trainbisect
done
echo '{"mark": "trainbisect done"}' >> "$TOUT"

QOUT=/root/repo/BENCH_SWEEP_r05c.jsonl
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
brow b48-c12-u2-fastsm $B MMMM_DENSE_FAST_SOFTMAX=1

echo "QUEUE R05C DONE" >> "$QOUT"
