#!/bin/bash
# Post-sweep on-chip measurement queue (round 4): train throughput with remat
# comparison (VERDICT #6), long-context decode bandwidth probe (#9), and the
# on-chip exhaustive GELU sweep (ADVICE r3).
cd /root/repo
# wait for the serving sweep to finish (chip + 1-core host: never overlap)
while ! grep -q "SWEEP DONE" BENCH_SWEEP_r04.jsonl 2>/dev/null; do sleep 60; done

: > BENCH_TRAIN_r04.jsonl
for remat in attn none full; do
  echo "=== train remat=$remat ===" >&2
  python scripts/bench_train.py --remat $remat --steps 5 >> BENCH_TRAIN_r04.jsonl 2>>/tmp/train_bench.log
done

python scripts/tpu_probes.py longctx > PROBE_LONGCTX_r04.jsonl 2>>/tmp/probe.log
python scripts/gelu_onchip_sweep.py > GELU_ONCHIP_r04.json 2>>/tmp/gelu.log
echo "QUEUE DONE"
