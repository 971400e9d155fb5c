#!/bin/bash
# Round-4 queue, part Q: A/B the two new serving knobs + flagship train rows.
#
#   1. MMMM_PREFILL_CHUNK_MODE=vit — chunk only the ViT, LLM prefill once at
#      full batch (one W8A16 dequant pass per batch instead of per chunk).
#   2. MMMM_SAM_BF16=1 — SAM mask pass in bf16 (fp32 matmuls are the slow
#      MXU path; serving-only knob, fp32 stays the parity default).
#   3. both stacked.
#   4. train gauge at the 6.5b flagship shape (B2, then B4 if B2 fits).
#
# These rows are also the on-chip verification drive for commits a0698eb
# and b14dba1 (the knobs' code paths run end-to-end on the chip here).
set -u
cd /root/repo
while ! grep -q "QUEUE P DONE" /root/repo/PROBE_PREFILL_r04.jsonl 2>/dev/null; do sleep 60; done
while [ -f /tmp/suite_running ]; do sleep 60; done
OUT=/root/repo/BENCH_SWEEP_r04q.jsonl

run() {
  echo "=== $* ===" >&2
  local tag=$1; shift
  local line
  line=$(env "$@" MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"${OUT}.log" | tail -1)
  echo "{\"tag\": \"$tag\", \"res\": ${line:-null}}" >> "$OUT"
}

B="MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12 MMMM_DECODE_UNROLL=2"
run b48-c12-u2-vitchunk   $B MMMM_PREFILL_CHUNK_MODE=vit
run b48-c12-u2-sambf16    $B MMMM_SAM_BF16=1
run b48-c12-u2-vit-sam    $B MMMM_PREFILL_CHUNK_MODE=vit MMMM_SAM_BF16=1

# flagship-scale train gauge (13 GB bf16 frozen base + LoRA; B2 first)
python scripts/bench_train.py --config 6.5b --remat attn --batch 2 --seq 1024 \
  >> /root/repo/BENCH_TRAIN_r04.jsonl 2>>"${OUT}.log"
if tail -1 /root/repo/BENCH_TRAIN_r04.jsonl | grep -q 'train_tokens_per_sec_6.5b'; then
  python scripts/bench_train.py --config 6.5b --remat attn --batch 4 --seq 1024 \
    >> /root/repo/BENCH_TRAIN_r04.jsonl 2>>"${OUT}.log"
fi

echo "SWEEP DONE" >> "$OUT"
echo "QUEUE Q DONE" >> "$OUT"
