#!/usr/bin/env python
"""Stage decomposition of the serving bench (where does the batch-time go?).

The headline bench times one fused `generate_grounded` call; its wall-clock
splits into (a) the jitted generate program (prefill + decode scan), (b) the
host tail (token fetch through the ~10 MB/s relay, tokenizer decode,
`parse_targets`, eop-position scan), and (c) the jitted SAM grounding stage.
Decode is at its HBM roofline and prefill at ~0.49 MFU (round-3/4 bench), so
the actionable headroom — if any — hides in whichever of these is NOT compute.

Reuses bench.py's builders so shapes/weights match the headline row exactly.
Each stage is fenced with a host fetch of a small on-device reduction (the
axon relay's block_until_ready does not block).

Output: one JSON line {"probe": "serving_stages", ...} per config.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import bench


def main() -> None:
    from mmmm_tpu.models.inference import _generate_stage, _grounding_stage

    batch = int(os.environ.get("MMMM_BENCH_BATCH", "28"))
    new_tokens = int(os.environ.get("MMMM_BENCH_NEWTOK", "128"))
    kv = os.environ.get("MMMM_BENCH_KV", "bf16")
    params, cfg, tokenizer = bench.build_params()

    b, s = batch, bench.PROMPT_LEN
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 32000, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + bench.N_VIS].set(1)
    pos = jnp.cumsum(
        jnp.concatenate([jnp.ones((1,), jnp.int32), (tt[0][1:] == 0).astype(jnp.int32)])
    )[None] - 1
    pos = jnp.broadcast_to(pos, (b, s))
    image = jnp.ones((b, 3, 32, 384, 384), jnp.bfloat16)
    grounding_image = jnp.ones((b, 3, 32, 256, 256), jnp.uint8)
    prompt_len = jnp.full((b,), s, jnp.int32)

    gen = _generate_stage(
        cfg, new_tokens, tokenizer.eos_token_id, tokenizer.bop_token_id,
        tokenizer.eop_token_id, (16, 16, 16), (2, 2, 2), "auto", True,
        (1, 1 + bench.N_VIS), kv, 0, 0,
    )

    def run_gen():
        res, _ = gen(params, ids, tt, pos, prompt_len, image)
        # fence with the small token output (the scan's final artifact)
        toks = np.asarray(res.tokens)
        return res, toks

    res, toks = run_gen()  # compile
    t0 = time.time()
    res, toks = run_gen()
    t_gen = time.time() - t0

    # host tail: tokenizer decode + parse + eop scan (pure host CPU)
    t0 = time.time()
    texts = [
        tokenizer.decode([int(t) for t in row if int(t) != tokenizer.eos_token_id])
        for row in toks
    ]
    tokenizer.parse_targets(toks)
    positions = np.zeros((b, 4), np.int64)
    for i in range(b):
        (eops,) = np.nonzero(toks[i] == tokenizer.eop_token_id)
        positions[i, : len(eops[:4])] = eops[:4]
    t_host = time.time() - t0

    # SAM grounding stage on the generate output (semantic mode, forced
    # position-0 prompts — exactly the bench's force_grounding path)
    stage = _grounding_stage(cfg, (16, 16, 16), False, "auto")
    pos_dev = jnp.asarray(positions)

    def run_sam():
        masks = stage(params, res.hidden, pos_dev, grounding_image)
        np.asarray(jnp.sum(masks.astype(jnp.float32)))

    run_sam()  # compile
    t0 = time.time()
    run_sam()
    t_sam = time.time() - t0

    total = t_gen + t_host + t_sam
    print(json.dumps({
        "probe": "serving_stages", "batch": b, "new_tokens": new_tokens,
        "kv_cache": kv,
        "t_gen_s": round(t_gen, 3), "t_host_s": round(t_host, 3),
        "t_sam_s": round(t_sam, 3), "stage_sum_s": round(total, 3),
        "reports_per_sec_from_sum": round(b / total, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
