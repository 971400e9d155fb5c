#!/usr/bin/env python
"""Downstream finetuning CLI (VQA / report generation).

Equivalent surface to ``scripts/finetune/cli.py`` in the reference: finetune
the pretrained MMMM (adapter) on a downstream VQA or report dataset. This is
the ``fit`` pipeline specialized to a single vl-type dataset with
task-appropriate transform probabilities, plus adapter warm-starting.

    python scripts/finetune/cli.py -c conf/finetune/vqa.yaml \
        --dataset-dir <processed/VQA-RAD> [--init-adapter runs/phase-vlm/adapter.npz]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--dataset-dir", required=True)
    parser.add_argument("--task", choices=["vqa", "report"], default="vqa")
    parser.add_argument("--init-adapter", help="adapter.npz to warm-start from")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from mmmm_tpu.build import build_dataset, build_model, build_tokenizer
    from mmmm_tpu.config import apply_overrides, build, load_yaml, resolve_interpolations
    from mmmm_tpu.peft import LoraConfig
    from mmmm_tpu.train import OptimizerConfig
    from mmmm_tpu.train.trainer import Trainer, TrainerConfig

    cfg = load_yaml(args.config, resolve=False)
    cfg = apply_overrides(cfg, args.overrides)
    cfg = resolve_interpolations(cfg)
    data_cfg = cfg.setdefault("data", {})
    ds_dir = Path(args.dataset_dir)
    data_cfg["datasets"] = [{"name": ds_dir.name, "type": "vl", "dir": str(ds_dir)}]
    vt = data_cfg.setdefault("vl_trans", {})
    if args.task == "vqa":
        # VQA-only: never sample the report branch
        vt.setdefault("report_ratio", 0.0)
        vt.setdefault("ac_ratio", 0.0)
    else:
        vt.setdefault("report_ratio", 1.0)

    tokenizer = build_tokenizer(cfg.get("tokenizer"))
    model = build_model(cfg.get("model"), tokenizer)
    dataset = build_dataset(data_cfg, tokenizer, Path(args.config).parent)
    trainer = Trainer(
        model,
        dataset,
        build(OptimizerConfig, cfg.get("optimizer") or {}),
        build(LoraConfig, cfg.get("lora") or {}),
        build(TrainerConfig, cfg.get("trainer") or {}),
    )
    if args.init_adapter:
        import jax

        from mmmm_tpu.train.checkpoint import load_adapter

        # warm-start: write the adapter as a step-0 checkpoint, then let
        # Trainer.fit's resume path pick it up (fresh optimizer state)
        warm = load_adapter(args.init_adapter)
        from mmmm_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(Path(trainer.cfg.out_dir) / "ckpt", 1)
        ckpt.maybe_save(
            0,
            {"trainable": warm, "opt_state": jax.device_get(trainer.optimizer.init(warm))},
        )
        ckpt.wait()
    trainer.fit(resume=bool(args.init_adapter))


if __name__ == "__main__":
    main()
