#!/bin/bash
# Round-4 queue, part B: after the W4 sweep, (1) decompose the headline
# batch-time into gen-program / host-tail / SAM-stage (scripts/bench_stages.py)
# and (2) run the default bench end-to-end so the long-decode (512-token) and
# speculative gauge rows get their first on-chip execution.
cd /root/repo
while ! grep -q "SWEEP DONE" BENCH_SWEEP_r04b.jsonl 2>/dev/null; do sleep 60; done

python scripts/bench_stages.py > PROBE_STAGES_r04.jsonl 2>>/tmp/stages.log
python bench.py > BENCH_SELF_r04.json 2>>/tmp/bench_self.log
echo "QUEUE B DONE" >> PROBE_STAGES_r04.jsonl
