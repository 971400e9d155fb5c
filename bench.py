"""Benchmark: grounded-report generation throughput on one TPU chip.

Measures the north-star metric (BASELINE.md): reports/sec/chip for
image -> report greedy generation (multimodal prefill with 144+2 vision tokens
+ 128 new tokens) on the flagship architecture at single-chip scale, bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to the first recorded run on this hardware
(BENCH_BASELINE.json, committed at round 1), so the driver can track
round-over-round perf.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PATH = Path(__file__).parent / "BENCH_BASELINE.json"
MAX_NEW_TOKENS = 128
BATCH = 64


def build():
    from __graft_entry__ import _single_chip_cfg
    from mmmm_tpu.models import MMMMModel
    from mmmm_tpu.models.generate import greedy_generate

    cfg = _single_chip_cfg()
    model = MMMMModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)["cogvlm"]

    b, s = BATCH, 192
    n_vis = 146
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 32000, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + n_vis].set(1)
    pos = jnp.concatenate(
        [jnp.asarray([[0, 1]]), jnp.full((1, n_vis - 2), 2), jnp.asarray([[3, 4]]),
         5 + jnp.arange(s - n_vis - 2)[None]], axis=1,
    ).astype(jnp.int32)
    pos = jnp.broadcast_to(pos, (b, s))
    image = jnp.ones((b, 3, 32, 384, 384), jnp.bfloat16)
    prompt_len = jnp.full((b,), s, jnp.int32)

    def gen(params, ids, tt, pos, prompt_len, image):
        res = greedy_generate(
            params, cfg.vlm, ids, tt, pos, prompt_len,
            max_new_tokens=MAX_NEW_TOKENS, eos_token_id=2,
            bop_token_id=32004, eop_token_id=32005,
            image=image, patch_size=(16, 16, 16), pool_size=(2, 2, 2),
        )
        return res.tokens

    jgen = jax.jit(gen)
    args = (params, ids, tt, pos, prompt_len, image)
    return jgen, args


def main():
    jgen, args = build()
    # compile + warmup; NOTE: on the axon relay backend block_until_ready does
    # not actually block — a host fetch (np.asarray) is required to force and
    # fence execution, so each iteration fetches the (tiny) token output.
    np.asarray(jgen(*args))
    n_iters = 5
    t0 = time.time()
    for _ in range(n_iters):
        np.asarray(jgen(*args))
    dt = (time.time() - t0) / n_iters
    reports_per_sec = BATCH / dt

    if BASELINE_PATH.exists():
        baseline = json.loads(BASELINE_PATH.read_text())["reports_per_sec"]
    else:
        baseline = reports_per_sec
        BASELINE_PATH.write_text(json.dumps({"reports_per_sec": reports_per_sec}))
    print(
        json.dumps(
            {
                "metric": "grounded_report_generation_throughput",
                "value": round(reports_per_sec, 3),
                "unit": "reports/sec/chip",
                "vs_baseline": round(reports_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
