#!/bin/bash
# Round-4 queue, part F2: rerun the (fixed) qdot probe with the W8A8 native
# int8-matmul variant, then the full default bench (headline B40 + 512-token
# long row + spec row).
cd /root/repo
while ! grep -q "QUEUE E DONE" PROBE_QDOT_r04.jsonl 2>/dev/null; do sleep 60; done
python scripts/tpu_probes.py qdot > PROBE_QDOT_r04b.jsonl 2>>/tmp/probe_f2.log
python bench.py > BENCH_SELF_r04.json 2>>/tmp/bench_self.log
echo BENCH SELF DONE >> /tmp/bench_self.log
