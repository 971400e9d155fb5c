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


def build_tokenizer(cfg: dict):
    from mmmm_tpu.data.tokenizer import MMMMTokenizer

    path = (cfg or {}).get("path")
    if path:
        return MMMMTokenizer.from_pretrained(path)
    return MMMMTokenizer.byte_fallback()


def build_model(cfg: dict, tokenizer):
    import dataclasses

    from mmmm_tpu.config import build
    from mmmm_tpu.models import MMMMConfig, MMMMModel

    mcfg: MMMMConfig = build(MMMMConfig, cfg or {})
    mcfg = dataclasses.replace(
        mcfg,
        bop_token_id=tokenizer.bop_token_id,
        eop_token_id=tokenizer.eop_token_id,
        vlm=dataclasses.replace(mcfg.vlm, vocab_size=max(mcfg.vlm.vocab_size, len(tokenizer))),
    )
    return MMMMModel(mcfg)


def build_dataset(cfg: dict, tokenizer, conf_dir: Path):
    from mmmm_tpu.config import build
    from mmmm_tpu.data.dataset import DatasetSpec, MultiDataset
    from mmmm_tpu.data.grg import GRGTransConf
    from mmmm_tpu.data.local import DatasetConf, LocalTransConf
    from mmmm_tpu.data.vl import VLTransConf

    dconf: DatasetConf = build(DatasetConf, cfg.get("conf") or {})
    if cfg.get("vl_trans") is not None:
        dconf.vl_trans = build(VLTransConf, cfg["vl_trans"])
    if cfg.get("grg_trans") is not None:
        dconf.grg_trans = build(GRGTransConf, cfg["grg_trans"])
    specs = []
    for s in cfg.get("datasets", []):
        d = dict(s)
        if d.get("dir"):
            p = Path(d["dir"])
            if not p.is_absolute():
                p = (conf_dir / p).resolve()
            d["dir"] = p
        specs.append(DatasetSpec(**d))
    tax_path = cfg.get("target_tax")
    target_tax = None
    if tax_path:
        from mmmm_tpu.data.target_tax import load_target_tax

        target_tax = load_target_tax(tax_path)
    return MultiDataset(dconf, specs, tokenizer, target_tax=target_tax)


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

    print(f"devices: {jax.devices()}", flush=True)
    trainer = Trainer(model, dataset, opt_cfg, lora_cfg, trainer_cfg)
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
