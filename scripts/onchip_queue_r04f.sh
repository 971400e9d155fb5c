#!/bin/bash
# Round-4 queue, part F: rerun the full default bench (headline + 512-token
# long row + speculative gauge row) after the probes — the first attempt lost
# its rows to the prefill-gauge OOM (fixed: per-row input buffers now freed).
cd /root/repo
while ! grep -q "QUEUE E DONE" PROBE_QDOT_r04.jsonl 2>/dev/null; do sleep 60; done
python bench.py > BENCH_SELF_r04.json 2>>/tmp/bench_self.log
echo BENCH SELF DONE >> /tmp/bench_self.log
