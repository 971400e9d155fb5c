#!/usr/bin/env python
"""Training-throughput gauge: tokens/sec + MFU for the LoRA train step.

Serving has ``bench.py``; this measures the TRAINING side on one chip — the
~1.4 B single-chip config (``__graft_entry__`` shape: frozen bf16 base +
LoRA + SAM heads unfrozen is the phase-vg recipe) with the fused blockwise
CE and a selectable remat policy.

    python scripts/bench_train.py [--remat attn|full|none] [--batch 8]
        [--seq 1024] [--steps 5]

Prints one JSON line {"metric": "train_tokens_per_sec_1.4b", ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", default="attn", choices=["attn", "full", "none"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--vis", type=int, default=146)
    ap.add_argument("--config", default="1.4b", choices=["tiny", "1.4b", "6.5b"],
                    help="6.5b = the serving-bench flagship shape (13 GB bf16 "
                    "frozen base; LoRA state + remat'd activations must fit "
                    "the remaining ~3 GB — start at --batch 2)")
    ap.add_argument("--attn", default="xla",
                    help="attn_impl for the step (auto|flash|xla|ring): the "
                         "r5 trainbisect put attention at 258 ms of the "
                         "658 ms 1.4b step vs a ~20 ms matmul floor; xla "
                         "measured 596.3 ms vs auto/flash 658.4 (default "
                         "flipped, matching TrainerConfig)")
    ap.add_argument("--vg", default="none",
                    choices=["none", "semantic", "instance"],
                    help="grounding mode in the step (the stage-1 recipe is a "
                    "mix of all three buckets, conf/phase-vg/fit.yaml): "
                    "semantic = SAM mask pass + DiceFocal; instance = iSAM + "
                    "Hungarian box matching (VinDr box-only bucket)")
    ap.add_argument("--gsize", type=int, nargs=3, default=(32, 256, 256),
                    metavar=("D", "H", "W"),
                    help="grounding-image shape for the vg rows")
    args = ap.parse_args(argv)

    if os.environ.get("MMMM_CPU") == "1":
        # force CPU for host-side smokes: JAX_PLATFORMS=cpu in the env is
        # INEFFECTIVE here (the axon sitecustomize imports jax and pins the
        # platform before the interpreter reads our env), so flip the config
        # after import — and never probe the relay (a stray jax.devices()
        # subprocess would grab the chip while a timed queue row runs)
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # ride out transient relay outages instead of dying at backend init
        import bench as _bench

        _bench._wait_for_backend(float(os.environ.get("MMMM_BENCH_WAIT", "1800")))

    import jax
    import jax.numpy as jnp

    from mmmm_tpu.models import MMMMConfig, MMMMModel
    from mmmm_tpu.models.cogvlm import CogVLMConfig, VisionConfig
    from mmmm_tpu.models.segvol import SamConfig
    from mmmm_tpu.peft import LoraConfig
    from mmmm_tpu.train import OptimizerConfig, init_train_state, make_optimizer, make_train_step

    img_shape, patch, pool = (3, 16, 384, 384), (16, 16, 16), (1, 2, 2)
    if args.config == "6.5b":
        # the serving flagship shape (bench._bench_cfg) so the train gauge
        # exists at the same scale as the headline serving number
        import bench

        cfg = bench._bench_cfg()
    elif args.config == "tiny":
        # CPU smoke shape (tests/conftest pins tests to CPU; this keeps the
        # vg rows runnable without the chip)
        cfg = MMMMConfig.tiny()
        img_shape, patch, pool = (3, 4, 16, 16), (4, 4, 4), (1, 1, 1)
        args.gsize = (4, 16, 16)
    else:
        cfg = MMMMConfig(
            vlm=CogVLMConfig(
                vocab_size=32008, hidden_size=2048, intermediate_size=5504,
                num_hidden_layers=12, num_attention_heads=16,
                vision=VisionConfig(
                    hidden_size=1024, intermediate_size=4096, num_hidden_layers=12,
                    num_heads=16, patch_size=(16, 16, 16), pos_embed_shape=(8, 32, 32),
                ),
            ),
            sam=SamConfig(),
        )
    model = MMMMModel(cfg)
    opt = make_optimizer(OptimizerConfig(lr=5e-5, warmup_steps=10, max_steps=1000))
    lcfg = LoraConfig(r=64, alpha=8)
    state, frozen = init_train_state(
        jax.random.PRNGKey(0), model, opt, lcfg, frozen_vlm_bf16=True
    )
    remat = {"attn": "attn", "full": True, "none": False}[args.remat]
    # static expert-span routing (exact for the input_builder layout this
    # batch mirrors; MMMM_TRAIN_SPAN=0 A/Bs the old dual dense path)
    span = "auto" if os.environ.get("MMMM_TRAIN_SPAN", "1") == "1" else None
    step = make_train_step(
        model, opt, lcfg, vg_mode=args.vg, bf16_vlm=True, attn_impl=args.attn,
        remat=remat, vis_span=span,
    )

    b, s, nv = args.batch, args.seq, args.vis
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, 32000, size=(b, s)), jnp.int32),
        "token_type_ids": jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + nv].set(1),
        "position_ids": jnp.broadcast_to(jnp.arange(s), (b, s)).astype(jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.full((b, s), -100, jnp.int32).at[:, nv + 2 :].set(7),
        "weight": jnp.ones((b, s), jnp.float32),
        # phase-vg vision budget: 144 tokens = (1, 12, 12) post-pool grid
        # (max_vision_tokens=144, BASELINE.md) — a (16, 384, 384) volume at
        # patch 16 / pool (1, 2, 2)
        "image": jnp.ones((b, *img_shape), jnp.float32),
        "patch_size": patch,
        "pool_size": pool,
    }
    if args.vg != "none":
        # stage-1 grounding bucket shapes (conf/phase-vg): 4 padded targets,
        # SegVol-size grounding volume; positions point past the vision span
        n_tgt = 4
        gd, gh, gw = args.gsize
        batch["grounding_image"] = jnp.ones((b, 3, gd, gh, gw), jnp.float32)
        batch["vg_positions"] = jnp.asarray(
            rng.integers(nv + 2, s - 1, size=(b, n_tgt)), jnp.int32)
        batch["vg_valid"] = jnp.ones((b, n_tgt), bool)
        if args.vg == "semantic":
            batch["masks"] = jnp.asarray(
                rng.uniform(size=(b, n_tgt, gd, gh, gw)) > 0.8)
        else:  # instance: VinDr box-only bucket (Hungarian on boxes + disc)
            lmax = 6
            batch["boxes_label"] = jnp.asarray(
                rng.uniform(0.2, 0.8, size=(b, lmax, 6)), jnp.float32)
            offs = np.zeros((b, n_tgt, 2), np.int32)
            offs[:, 0] = (0, 2)  # two boxes for target 0, rest empty
            offs[:, 1:] = (2, 2)
            batch["index_offsets"] = jnp.asarray(offs)

    state, logs = step(state, frozen, batch)  # compile + warm
    np.asarray(jnp.sum(logs.get("loss", logs["lm_loss"])))
    t0 = time.time()
    for _ in range(args.steps):
        state, logs = step(state, frozen, batch)
    np.asarray(jnp.sum(logs.get("loss", logs["lm_loss"])))  # fence (relay: block_until_ready lies)
    dt = (time.time() - t0) / args.steps

    v = cfg.vlm
    # fwd+bwd matmul FLOPs = 3x fwd (bwd has two matmuls per fwd matmul)
    llm_tok = 8 * v.hidden_size**2 + 6 * v.hidden_size * v.intermediate_size
    vi = v.vision
    t_vit = 24 * 24 + 1
    vit = vi.num_hidden_layers * t_vit * (
        8 * vi.hidden_size**2 + 4 * vi.hidden_size * vi.intermediate_size
        + 4 * t_vit * vi.hidden_size
    )
    fwd = b * (
        v.num_hidden_layers * s * (llm_tok + 4 * s * v.hidden_size)
        + vit + 2 * v.hidden_size * v.vocab_size * s
    )
    flops = 3 * fwd
    tok_s = b * s / dt
    suffix = "" if args.vg == "none" else f"_vg-{args.vg}"
    print(json.dumps({
        "metric": f"train_tokens_per_sec_{args.config}{suffix}",
        "value": round(tok_s, 1),
        "unit": "tokens/sec/chip",
        "step_ms": round(dt * 1e3, 1),
        # mfu counts LLM+ViT+head matmuls only; the vg rows run SAM/iSAM on
        # top, so their mfu understates utilization — compare step_ms
        "mfu": round(flops / dt / 197e12, 4),
        "remat": args.remat,
        "vg_mode": args.vg,
        "attn": args.attn,
        "expert_span": span is not None,
        "batch": b, "seq": s,
        "loss": float(np.asarray(logs.get("loss", logs["lm_loss"]))),
    }))


if __name__ == "__main__":
    main()
