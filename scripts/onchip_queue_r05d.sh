#!/bin/bash
# Round-5 queue D (session 2, post-restart) — consolidated remainder of
# queues A/B/C in priority order. The machine restart killed the original
# chain after the prefill bisect; everything below is still unmeasured.
#   1. serving A/Bs at the b48-c12-u2 base: fastsm / vitchunk / sambf16 /
#      triple combo — these decide the round-5 bench defaults
#   2. spec-kernel on-chip gate (decides whether the spec gauge rides the
#      window kernels)
#   3. [waits for /tmp/r05d_go or 30 min] canonical bench -> BENCH_SELF_r05
#      (the agent flips bench.py defaults to the A/B winners first)
#   4. train: 6.5b gauge, trainbisect variants, vg rows, 1.4b control
#   5. probes: qdot prefill-M, SAM stage row, longctx table, long512 bisect,
#      int8-KV capacity rows
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

QOUT=/root/repo/BENCH_SWEEP_r05d.jsonl
brow() {  # one HEADLINE-gauge-only bench row (child mode: single subprocess)
  local tag=$1; shift
  gate; relay
  echo "=== $tag $(date -u +%FT%TZ) ===" >> "${QOUT}.log"
  local line
  line=$(env "$@" MMMM_BENCH_GAUGE=headline python bench.py \
         2>>"${QOUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$QOUT"
}

# ---- 1. serving A/Bs (base = r4 headline config, already the default) ------
brow b48-c12-u2-fastsm   MMMM_DENSE_FAST_SOFTMAX=1
brow b48-c12-u2-vitchunk MMMM_PREFILL_CHUNK_MODE=vit
brow b48-c12-u2-sambf16  MMMM_SAM_BF16=1
brow b48-c12-u2-triple   MMMM_DENSE_FAST_SOFTMAX=1 MMMM_PREFILL_CHUNK_MODE=vit MMMM_SAM_BF16=1

# ---- 2. spec-kernel gate ---------------------------------------------------
SOUT=/root/repo/SPEC_KERNELS_r05.log
row "$SOUT" "$SOUT" python scripts/verify_spec_kernels.py
echo "AB PHASE DONE $(date -u +%FT%TZ)" >> "$QOUT"

# ---- 3. canonical bench (agent flips defaults first; 30 min grace) ---------
for i in $(seq 180); do [ -f /tmp/r05d_go ] && break; sleep 10; done
row /root/repo/BENCH_SELF_r05.log /root/repo/BENCH_SELF_r05.json python bench.py

# ---- 4. training -----------------------------------------------------------
TOUT=/root/repo/BENCH_TRAIN_r05.jsonl
row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 6.5b \
  --remat attn --batch 2 --seq 1024
BOUT=/root/repo/PROBE_TRAINBISECT_r05.jsonl
for v in full novit noattn nollmattn noce; do
  row "$BOUT.log" "$BOUT" env MMMM_PROBE_VARIANT=$v \
    python scripts/tpu_probes.py trainbisect
done
echo '{"mark": "trainbisect done"}' >> "$BOUT"
row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 1.4b --remat attn \
  --batch 4 --seq 1024 --vg semantic
row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 1.4b --remat attn \
  --batch 4 --seq 1024 --vg instance
row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 1.4b --remat attn \
  --batch 8 --seq 1024

# ---- 5. probes -------------------------------------------------------------
POUT=/root/repo/PROBE_PREFILL_r05.jsonl
row "$POUT.log" "$POUT" env MMMM_PROBE_M=2304 python scripts/tpu_probes.py qdot
row "$POUT.log" "$POUT" python scripts/tpu_probes.py stages --only sam
LOUT=/root/repo/PROBE_LONGCTX_r05.jsonl
row "$LOUT.log" "$LOUT" python scripts/tpu_probes.py longctx
row "${QOUT}.log" "${QOUT}.long512" python scripts/probe_long512.py
row "$LOUT.log" "$LOUT" env MMMM_BENCH_GAUGE=long MMMM_BENCH_LONG_KV=int8 \
  python bench.py
row "$LOUT.log" "$LOUT" env MMMM_BENCH_GAUGE=long MMMM_BENCH_LONG_KV=bf16 \
  python bench.py

echo "QUEUE R05D DONE" >> "$QOUT"
