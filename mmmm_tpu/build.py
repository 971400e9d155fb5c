"""Object builders shared by the CLIs: config dicts -> tokenizer/model/dataset.

(The script-level ``cli.py`` files import from here so entry points don't
shadow each other under the module name ``cli``.)
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

from .config import build


def build_tokenizer(cfg: dict | None):
    from .data.tokenizer import MMMMTokenizer

    path = (cfg or {}).get("path")
    if path:
        return MMMMTokenizer.from_pretrained(path)
    return MMMMTokenizer.byte_fallback()


def build_model(cfg: dict | None, tokenizer):
    from .models import MMMMConfig, MMMMModel

    mcfg: MMMMConfig = build(MMMMConfig, cfg or {})
    mcfg = dataclasses.replace(
        mcfg,
        bop_token_id=tokenizer.bop_token_id,
        eop_token_id=tokenizer.eop_token_id,
        vlm=dataclasses.replace(mcfg.vlm, vocab_size=max(mcfg.vlm.vocab_size, len(tokenizer))),
    )
    return MMMMModel(mcfg)


def build_dataset(cfg: dict, tokenizer, conf_dir: Path):
    from .data.dataset import DatasetSpec, MultiDataset
    from .data.grg import GRGTransConf
    from .data.local import DatasetConf
    from .data.vl import VLTransConf

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
        from .data.target_tax import load_target_tax

        target_tax = load_target_tax(tax_path)
    return MultiDataset(
        dconf, specs, tokenizer, target_tax=target_tax,
        # phase configs ship the full reference rosters; train on whatever
        # subset is processed on disk (skip_missing: false to hard-fail)
        skip_missing=bool(cfg.get("skip_missing", True)),
    )


def load_model_with_adapter(config_path: str, adapter: str | None,
                            quantize: bool = False):
    """Config (+ optional adapter.npz) -> (model, merged jnp params, tokenizer,
    cfg). ``quantize=True`` applies W8A16 int8 serving quantization to the LLM
    after LoRA merge (``ops/quant.py``) — ~2x decode on one chip; use the
    exact bf16 path for parity checks."""
    import jax
    import jax.numpy as jnp

    from .config import load_yaml
    from .peft import LoraConfig, lora_merge, merge_trainable, split_trainable

    cfg = load_yaml(config_path)
    tokenizer = build_tokenizer(cfg.get("tokenizer"))
    model = build_model(cfg.get("model"), tokenizer)
    params = model.init(jax.random.PRNGKey(0))
    if adapter:
        from .train.checkpoint import load_adapter

        trainable = load_adapter(adapter)
        _, frozen = split_trainable(params)
        params = merge_trainable(trainable["ft"], frozen)
        lora_cfg = build(LoraConfig, cfg.get("lora") or {})
        params = lora_merge(params, trainable["lora"], lora_cfg)
        params = jax.tree.map(jnp.asarray, params)
    if quantize:
        from .ops.quant import quantize_llm_for_serving

        params = dict(params)
        params["cogvlm"] = quantize_llm_for_serving(params["cogvlm"])
    return model, params, tokenizer, cfg
