#!/bin/bash
# Round-4 queue, part E: after the part-D longctx probe, (1) the qdot decode
# matmul bandwidth probe (is W8A16 dequant fused or materialized at M=28?)
# and (2) ViT-only / prefill-only stage timings (one process per stage —
# holding several compiled 6.5B stages OOMs the chip).
cd /root/repo
while ! grep -q "QUEUE D DONE" PROBE_LONGCTX_r04b.jsonl 2>/dev/null; do sleep 60; done
python scripts/tpu_probes.py qdot > PROBE_QDOT_r04.jsonl 2>>/tmp/probe_e.log
python scripts/tpu_probes.py stages --only vit > PROBE_VIT_r04.jsonl 2>>/tmp/probe_e.log
python scripts/tpu_probes.py stages --only prefill >> PROBE_VIT_r04.jsonl 2>>/tmp/probe_e.log
echo "QUEUE E DONE" >> PROBE_QDOT_r04.jsonl
