#!/bin/bash
# Round-5 queue E — post-bisect takeover, priority order:
#   1. train attention A/B (xla vs the 658.4 ms flash step) — the bisect's
#      201 ms attention term is the whole remaining train gap
#   2. qdot at prefill M=2304 (VERDICT #1b int8-prefill verdict)
#   3. SAM stage row (completes the stage table)
#   4. longctx r05 table (VERDICT #3)
#   5. spec draft-length sweep at the headline (draft 5 / 9 vs 7's 19.99)
#   6. 6.5b remat=full batch=1 (closes the single-chip fit ladder)
#   7. int8-KV capacity long rows (int8 vs bf16 through the ladder gauge)
# (long512 probe DROPPED: the canonical long gauge's ladder answered it —
#  B16 fails compile under full AND ragged, B8+ragged runs.)
set -u
cd /root/repo
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

TOUT=/root/repo/BENCH_TRAIN_r05.jsonl
row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 1.4b \
  --remat attn --batch 8 --seq 1024 --attn xla

POUT=/root/repo/PROBE_PREFILL_r05.jsonl
row "$POUT.log" "$POUT" env MMMM_PROBE_M=2304 python scripts/tpu_probes.py qdot
row "$POUT.log" "$POUT" python scripts/tpu_probes.py stages --only sam

LOUT=/root/repo/PROBE_LONGCTX_r05.jsonl
row "$LOUT.log" "$LOUT" python scripts/tpu_probes.py longctx

SOUT=/root/repo/BENCH_SWEEP_r05e.jsonl
srow() {
  local tag=$1; shift
  gate; relay
  echo "=== $tag $(date -u +%FT%TZ) ===" >> "${SOUT}.log"
  local line
  line=$(env "$@" MMMM_BENCH_GAUGE=headline python bench.py \
         2>>"${SOUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$SOUT"
}
srow spec-draft5 MMMM_BENCH_SPEC=5
srow spec-draft9 MMMM_BENCH_SPEC=9

row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 6.5b \
  --remat full --batch 1 --seq 1024

row "$LOUT.log" "$LOUT" env MMMM_BENCH_GAUGE=long MMMM_BENCH_LONG_KV=int8 \
  python bench.py
row "$LOUT.log" "$LOUT" env MMMM_BENCH_GAUGE=long MMMM_BENCH_LONG_KV=bf16 \
  python bench.py

echo "QUEUE R05E DONE" >> "$SOUT"
