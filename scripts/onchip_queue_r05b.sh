#!/bin/bash
# Round-5 queue B — runs after queue A's sentinel. Spec-kernel gate, the
# canonical bench artifact, train vg rows, and the int8-KV long-context
# capacity rows.
set -u
cd /root/repo

until grep -q "QUEUE R05A DONE" BENCH_SWEEP_r05a.jsonl 2>/dev/null; do sleep 120; done
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

# 0. ViT attention attribution: kernel-vs-layout-vs-headpad (decides the
#    round-5 ViT fix; bisect r05 shows attention ~283 ms vs ~80 ms ceiling)
VOUT=/root/repo/PROBE_VITATTN_r05.jsonl
row "$VOUT.log" "$VOUT" env MMMM_PROBE_B=12 python scripts/tpu_probes.py vitattn
row "$VOUT.log" "$VOUT" env MMMM_PROBE_B=48 python scripts/tpu_probes.py vitattn

OUT=/root/repo/SPEC_KERNELS_r05.log
# 1. spec-kernel correctness gate + verify-step timing A/B
row "$OUT" "$OUT" python scripts/verify_spec_kernels.py

# 2. canonical bench artifact (per-gauge subprocess isolation; spec gauge now
#    rides the window kernels) — this is the shape the driver runs
row /root/repo/BENCH_SELF_r05.log /root/repo/BENCH_SELF_r05.json python bench.py

# 3. train vg rows (stage-1 recipe) + the 1.4b control
TOUT=/root/repo/BENCH_TRAIN_r05.jsonl
row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 1.4b --remat attn \
  --batch 4 --seq 1024 --vg semantic
row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 1.4b --remat attn \
  --batch 4 --seq 1024 --vg instance
row "$TOUT.log" "$TOUT" python scripts/bench_train.py --config 1.4b --remat attn \
  --batch 8 --seq 1024

# 4. longctx table r05 (bf16 vs q8 bandwidth) + int8 capacity rows: the
#    512-token long gauge at B16 int8 vs bf16 through the subprocess gauge
POUT=/root/repo/PROBE_LONGCTX_r05.jsonl
row "$POUT.log" "$POUT" python scripts/tpu_probes.py longctx
row "$POUT.log" "$POUT" env MMMM_BENCH_GAUGE=long MMMM_BENCH_LONG_KV=int8 \
  python bench.py
row "$POUT.log" "$POUT" env MMMM_BENCH_GAUGE=long MMMM_BENCH_LONG_KV=bf16 \
  python bench.py

echo "QUEUE R05B DONE" >> "$OUT"
