#!/usr/bin/env python
"""Interactive / scripted grounded inference (``scripts/demo.py`` equivalent).

Loads a model config (+ optional imported torch checkpoint and adapter), runs
one image + question through grounded greedy generation, and prints the
report with any grounded targets (mask volumes / boxes summarized).

Usage:
    python scripts/demo.py -c conf/tiny/fit.yaml --image path.png \
        --question "Please write a radiology report for this image." \
        [--adapter runs/tiny/adapter.npz] [--max-new-tokens 256] [--instance]

Without ``--image`` a synthetic image is used (pipeline smoke test).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def load_model(config_path: str, adapter: str | None, quantize: bool = False):
    from mmmm_tpu.build import load_model_with_adapter

    return load_model_with_adapter(config_path, adapter, quantize=quantize)


def prepare_image(path: str | None, conf):
    from mmmm_tpu.data.infer_transform import image_transform

    if path:
        return image_transform(path, conf)
    synthetic = (np.random.default_rng(0).uniform(0, 255, size=(1, 1, 64, 64))).astype(np.uint8)
    return image_transform(synthetic, conf)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--adapter")
    parser.add_argument("--image")
    parser.add_argument("--question", default="Please write a radiology report for this image.")
    parser.add_argument("--max-new-tokens", type=int, default=256)
    parser.add_argument("--grounding", action="store_true", default=True)
    parser.add_argument("--instance", action="store_true")
    parser.add_argument(
        "--quantize", action="store_true",
        help="W8A16 int8 serving quantization of the LLM (~2x decode)",
    )
    parser.add_argument(
        "--kv-cache", default="bf16", choices=("bf16", "int8"),
        help="KV cache dtype; int8 halves decode cache bandwidth at long S",
    )
    parser.add_argument(
        "--speculate", type=int, default=0, metavar="K",
        help="n-gram speculative decoding with K drafts/step (0 = greedy); "
             "token-identical output, faster on templated reports",
    )
    parser.add_argument(
        "--tp", type=int, default=1, metavar="N",
        help="tensor-parallel serving over N devices (weights shard per the "
             "megatron rules incl. W8A16 {q,s} leaves; decode attention takes "
             "the XLA path — tests/test_tp_serving.py pins token-identity)",
    )
    parser.add_argument(
        "--interactive", action="store_true",
        help="multi-turn conversation: read follow-up questions from stdin "
             "(the reference demo's history loop, scripts/demo.py:22-76)",
    )
    args = parser.parse_args(argv)

    from mmmm_tpu.data import ConvTurn
    from mmmm_tpu.data.input_builder import prepare_vlm_inputs
    from mmmm_tpu.models.inference import generate_grounded

    model, params, tokenizer, cfg = load_model(args.config, args.adapter, quantize=args.quantize)
    dconf_dict = (cfg.get("data") or {}).get("conf") or {}
    from mmmm_tpu.config import build
    from mmmm_tpu.data.local import DatasetConf

    dconf = build(DatasetConf, dconf_dict)
    image, grounding_image, patch, pool, n_tokens = prepare_image(args.image, dconf)

    from mmmm_tpu.parallel.sharding import tp_serving_params

    params, attn_impl = tp_serving_params(params, args.tp)

    def run_turn(conversation):
        inputs, _ = prepare_vlm_inputs(
            conversation, tokenizer, n_tokens, inference=True, grounding=args.grounding
        )
        res = generate_grounded(
            params,
            model.cfg,
            tokenizer,
            jnp.asarray(inputs.input_ids)[None],
            jnp.asarray(inputs.token_type_ids)[None],
            jnp.asarray(inputs.position_ids)[None],
            jnp.asarray([len(inputs.input_ids)]),
            jnp.asarray(image)[None],
            patch,
            pool,
            max_new_tokens=args.max_new_tokens,
            grounding_image=jnp.asarray(grounding_image)[None],
            instance=args.instance,
            attn_impl=attn_impl,
            kv_cache_dtype=args.kv_cache,
            spec_draft_len=args.speculate,
        )
        print("=== generated ===")
        print(res.text[0])
        print("=== grounded targets ===")
        print(res.targets[0])
        if res.masks is not None and res.target_valid is not None and res.target_valid.any():
            probs = 1 / (1 + np.exp(-res.masks[0]))
            for i in range(int(res.target_valid[0].sum())):
                vox = int((probs[i] > 0.5).sum())
                print(f"target {i}: mask voxels>0.5 = {vox}")
        if res.boxes is not None and res.target_valid is not None and res.target_valid.any():
            disc = 1 / (1 + np.exp(-res.disc_logit[0]))
            for i in range(int(res.target_valid[0].sum())):
                best = int(np.argmax(disc[i]))
                print(f"target {i}: best instance p={disc[i, best]:.3f} box={np.round(res.boxes[0, i, best], 3)}")
        return res.text[0]

    conversation = [ConvTurn(args.question, "")]
    answer = run_turn(conversation)
    if args.interactive:
        import sys as _sys

        print("(enter follow-up questions; empty line to quit)")
        for line in _sys.stdin:
            q = line.strip()
            if not q:
                break
            conversation = conversation[:-1] + [ConvTurn(conversation[-1].prompt, answer), ConvTurn(q, "")]
            answer = run_turn(conversation)


if __name__ == "__main__":
    main()
