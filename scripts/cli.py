#!/usr/bin/env python
"""Training CLI: ``python scripts/cli.py fit -c conf/<phase>/fit.yaml [k=v ...]``.

Equivalent surface to the reference's LightningCLI entry point
(``scripts/cli.py`` + ``conf/phase-{vg,vlm,grg}``): YAML phase configs with
includes/interpolation, dotted CLI overrides, tokenizer/model/data/optimizer
construction, and the three-stage recipe driven purely by configs.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax


from mmmm_tpu.build import build_dataset, build_model, build_tokenizer  # noqa: E402


def cmd_fit(args):
    from mmmm_tpu.config import apply_overrides, build, load_yaml, resolve_interpolations
    from mmmm_tpu.peft import LoraConfig
    from mmmm_tpu.train import OptimizerConfig
    from mmmm_tpu.train.trainer import Trainer, TrainerConfig

    cfg = load_yaml(args.config, resolve=False)
    cfg = apply_overrides(cfg, args.overrides)
    cfg = resolve_interpolations(cfg)
    conf_dir = Path(args.config).parent

    tokenizer = build_tokenizer(cfg.get("tokenizer"))
    model = build_model(cfg.get("model"), tokenizer)
    dataset = build_dataset(cfg.get("data") or {}, tokenizer, conf_dir)
    opt_cfg = build(OptimizerConfig, cfg.get("optimizer") or {})
    lora_cfg = build(LoraConfig, cfg.get("lora") or {})
    trainer_cfg = build(TrainerConfig, cfg.get("trainer") or {})

    # NOTE: no jax.devices() before Trainer — it would initialize the backend
    # and break jax.distributed.initialize in multi-process runs
    trainer = Trainer(model, dataset, opt_cfg, lora_cfg, trainer_cfg)
    print(f"devices: {jax.devices()}", flush=True)
    trainer.fit(resume=not args.no_resume)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="mmmm-tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    fit = sub.add_parser("fit", help="run training for a phase config")
    fit.add_argument("-c", "--config", required=True)
    fit.add_argument("--no-resume", action="store_true")
    fit.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    fit.set_defaults(func=cmd_fit)
    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
