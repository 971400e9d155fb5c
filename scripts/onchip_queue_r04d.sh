#!/bin/bash
# Round-4 queue, part D: after the part-C sweep, re-run the longctx decode
# probe with the q8 kernel-variant ladder (f32-cast / bf16-cast / blk256).
cd /root/repo
while ! grep -q "SWEEP DONE" BENCH_SWEEP_r04c.jsonl 2>/dev/null; do sleep 60; done
python scripts/tpu_probes.py longctx > PROBE_LONGCTX_r04b.jsonl 2>>/tmp/probe_d.log
echo "QUEUE D DONE" >> PROBE_LONGCTX_r04b.jsonl
