"""Bisect the 512-token long-decode compile failure and time the row.

The bench's long row (B16, unchunked, smax=704) hits `HTTP 500:
tpu_compile_helper subprocess exit code 1` (remote-compiler OOM) even after
the chunk-padding fix — so the blocker is inside the single-program 512-step
generate itself. Candidate terms: the unroll=2 env leaking into a 512-step
scan, the kv_append kernel at smax=704, or the 704-slot full-read decode
kernel (11.5 MB scoped VMEM, near the 16 MB Mosaic ceiling — ragged is only
forced past S>768). This probe tries the row under progressively simpler
configs and records which one first compiles:

    unroll1+append   -> unroll1+no-append -> unroll1+append+ragged -> B8

Writes one JSON line per attempt to PROBE_LONG512_r04.jsonl.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path("/root/repo/PROBE_LONG512_r04.jsonl")


def main():
    import numpy as np  # noqa: F401

    import bench

    # the relay has transient outages; a probe that dies at backend init
    # wastes its whole queue slot (this happened to the first launch)
    bench._wait_for_backend(float(os.environ.get("MMMM_BENCH_WAIT", "1800")))
    params, cfg, tokenizer = bench.build_params()
    attempts = [
        ("b16-unroll1-append", dict(B=16, UNROLL="1", APPEND="1", RAGGED="0")),
        ("b16-unroll1-noappend", dict(B=16, UNROLL="1", APPEND="0", RAGGED="0")),
        ("b16-unroll1-append-ragged", dict(B=16, UNROLL="1", APPEND="1", RAGGED="1")),
        ("b8-unroll1-append", dict(B=8, UNROLL="1", APPEND="1", RAGGED="0")),
    ]
    for tag, conf in attempts:
        os.environ["MMMM_DECODE_UNROLL"] = conf["UNROLL"]
        os.environ["MMMM_KV_APPEND"] = conf["APPEND"]
        os.environ["MMMM_RAGGED_DECODE"] = conf["RAGGED"]
        rec = {"probe": "long512", "tag": tag}
        try:
            run, flops = bench.build_run(
                params, cfg, tokenizer, conf["B"], 512, "bf16", 0, spec=0
            )
            run()  # compile
            t0 = time.time()
            run()
            dt = time.time() - t0
            rec.update(
                ok=True, ms=round(dt * 1e3, 1),
                rep_s=round(conf["B"] / dt, 3),
                mfu=round(flops / dt / bench.V5E_PEAK_BF16, 4),
            )
        except Exception as e:  # noqa: BLE001
            rec.update(ok=False, error=f"{type(e).__name__}: {str(e)[:160]}")
        finally:
            run = None  # noqa: F841 — release device inputs on failure
        print(json.dumps(rec), flush=True)
        with OUT.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        if rec.get("ok"):
            break  # first compiling config answers the bisect
    print("LONG512 PROBE DONE")


if __name__ == "__main__":
    main()
