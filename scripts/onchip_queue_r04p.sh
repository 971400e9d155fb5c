#!/bin/bash
# Round-4 queue, part P: prefill attribution. Prefill is 1256 ms of the
# 2.76 s serving batch at B48 (46%, PROBE_STAGES_r04n) while decode sits at
# ~81% of its read roofline — so the next optimization target is inside
# prefill. This queue (1) completes the B48 stage table (vit/sam rows died
# in queue N holding two compiled programs; fixed in 2cd8c34), (2) runs the
# prefill bisect (gelu / vit-attn / patch-embed / vit / llm-attn / llm), and
# (3) A/Bs decode-scan unroll=4 on the headline config.
set -u
cd /root/repo
while ! grep -q "QUEUE O DONE" /root/repo/BENCH_SWEEP_r04o.jsonl 2>/dev/null; do sleep 60; done
while [ -f /tmp/suite_running ]; do sleep 60; done
OUT=/root/repo/PROBE_PREFILL_r04.jsonl

# 0. re-run the 512-token bisect (its first queue-O slot died at backend
#    init during a transient relay outage; it now waits the outage out)
python scripts/probe_long512.py >> /root/repo/BENCH_SWEEP_r04o.jsonl.log 2>&1

# 1. complete the B48 serving stage table (one stage per process: two
#    resident compiled 6.5B programs RESOURCE_EXHAUST the chip)
for s in vit sam; do
  python scripts/tpu_probes.py stages --only "$s" >> "$OUT" 2>>"$OUT.log"
done

# 2. prefill bisect at the serving batch
python scripts/tpu_probes.py prefillbisect >> "$OUT" 2>>"$OUT.log"

# 3. decode unroll=4 (unroll=2 bought +2.6%; check the next doubling)
line=$(env MMMM_DECODE_UNROLL=4 MMMM_BENCH_BATCH=48 MMMM_BENCH_PREFILL_CHUNK=12 \
  MMMM_BENCH_LONG=0 MMMM_BENCH_SPEC_ROW=0 python bench.py 2>>"$OUT.log" | tail -1)
echo "{\"tag\": \"b48-c12-unroll4\", \"res\": ${line:-null}}" >> /root/repo/BENCH_SWEEP_r04o.jsonl

echo '{"probe": "queue_p", "done": true}' >> "$OUT"
echo "QUEUE P DONE" >> "$OUT"
