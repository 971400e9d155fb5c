"""HF PEFT adapter interop: export/import LoRA factors in PEFT layout.

The reference releases checkpoints as HF PEFT LoRA adapters
(``README.md:61-65``; ``adapter_model.safetensors`` + ``adapter_config.json``),
so users can exchange weights both ways:

  - ``export_peft_adapter``: our stacked (L, in, r)/(L, r, out) factors ->
    per-layer ``...lora_A.weight`` (r, in) / ``...lora_B.weight`` (out, r)
    torch-convention tensors in a safetensors file;
  - ``import_peft_adapter``: the reverse, restacking per-layer tensors.

Name mapping covers the CogVLM module paths used by the reference's PEFT
wrapping (``base_model.model.model.layers.{i}.self_attn.*`` etc.).
"""
from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np

from ..peft import LoraConfig

# our stacked path -> (HF module format string, stacked?)
_PATH_MAP = {
    "cogvlm/llm/layers/vis_qkv": "base_model.model.model.layers.{}.self_attn.vision_expert_query_key_value",
    "cogvlm/llm/layers/lang_qkv": "base_model.model.model.layers.{}.self_attn.language_expert_query_key_value",
    "cogvlm/llm/layers/vis_dense": "base_model.model.model.layers.{}.self_attn.vision_expert_dense",
    "cogvlm/llm/layers/lang_dense": "base_model.model.model.layers.{}.self_attn.language_expert_dense",
    "cogvlm/llm/layers/vis_mlp/gate": "base_model.model.model.layers.{}.mlp.vision_mlp.gate_proj",
    "cogvlm/llm/layers/vis_mlp/up": "base_model.model.model.layers.{}.mlp.vision_mlp.up_proj",
    "cogvlm/llm/layers/vis_mlp/down": "base_model.model.model.layers.{}.mlp.vision_mlp.down_proj",
    "cogvlm/llm/layers/lang_mlp/gate": "base_model.model.model.layers.{}.mlp.language_mlp.gate_proj",
    "cogvlm/llm/layers/lang_mlp/up": "base_model.model.model.layers.{}.mlp.language_mlp.up_proj",
    "cogvlm/llm/layers/lang_mlp/down": "base_model.model.model.layers.{}.mlp.language_mlp.down_proj",
    "cogvlm/llm/lm_head": "base_model.model.lm_head",
    "cogvlm/vision/layers/qkv_w": "base_model.model.model.vision.transformer.layers.{}.attention.query_key_value",
    "cogvlm/vision/layers/dense_w": "base_model.model.model.vision.transformer.layers.{}.attention.dense",
    "cogvlm/vision/layers/fc1_w": "base_model.model.model.vision.transformer.layers.{}.mlp.fc1",
    "cogvlm/vision/layers/fc2_w": "base_model.model.model.vision.transformer.layers.{}.mlp.fc2",
    "cogvlm/vision/glu/linear_proj": "base_model.model.model.vision.linear_proj.linear_proj",
    "cogvlm/vision/glu/gate": "base_model.model.model.vision.linear_proj.gate_proj",
    "cogvlm/vision/glu/h4h": "base_model.model.model.vision.linear_proj.dense_h_to_4h",
    "cogvlm/vision/glu/4hh": "base_model.model.model.vision.linear_proj.dense_4h_to_h",
}


def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict) and not ("a" in v and "b" in v):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def export_peft_adapter(path: str | Path, lora_tree: dict, cfg: LoraConfig) -> None:
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    tensors = {}
    target_modules = set()
    for our_path, ab in _flatten(lora_tree).items():
        fmt = _PATH_MAP.get(our_path)
        if fmt is None:
            continue
        a, b = np.asarray(ab["a"]), np.asarray(ab["b"])
        target_modules.add(fmt.rsplit(".", 1)[-1])
        if a.ndim == 3:  # stacked layers
            for i in range(a.shape[0]):
                mod = fmt.format(i)
                tensors[f"{mod}.lora_A.weight"] = np.ascontiguousarray(a[i].T)
                tensors[f"{mod}.lora_B.weight"] = np.ascontiguousarray(b[i].T)
        else:
            tensors[f"{fmt}.lora_A.weight"] = np.ascontiguousarray(a.T)
            tensors[f"{fmt}.lora_B.weight"] = np.ascontiguousarray(b.T)
    save_file(tensors, str(path / "adapter_model.safetensors"))
    (path / "adapter_config.json").write_text(json.dumps({
        "peft_type": "LORA",
        "r": cfg.r,
        "lora_alpha": cfg.alpha,
        "lora_dropout": cfg.dropout,
        "use_rslora": cfg.use_rslora,
        "target_modules": sorted(target_modules),
        "bias": "none",
        "task_type": "CAUSAL_LM",
    }, indent=2))


def import_peft_adapter(path: str | Path, num_layers: int, num_vision_layers: int) -> tuple[dict, LoraConfig]:
    from safetensors.numpy import load_file

    path = Path(path)
    peft_cfg = json.loads((path / "adapter_config.json").read_text())
    cfg = LoraConfig(
        r=peft_cfg["r"],
        alpha=peft_cfg["lora_alpha"],
        dropout=peft_cfg.get("lora_dropout", 0.0),
        use_rslora=peft_cfg.get("use_rslora", False),
    )
    st_path = path / "adapter_model.safetensors"
    if st_path.exists():
        tensors = load_file(str(st_path))
    else:
        import torch

        raw = torch.load(path / "adapter_model.bin", map_location="cpu", weights_only=False)
        tensors = {k: v.numpy() for k, v in raw.items()}
    # strip any "weight"-naming variants: "...lora_A.weight" / "...lora_A.default.weight"
    norm = {}
    for k, v in tensors.items():
        k2 = re.sub(r"\.lora_(A|B)\.(default\.)?weight$", r".lora_\1", k)
        norm[k2] = v

    tree: dict = {}

    def set_path(p, value):
        cur = tree
        parts = p.split("/")
        for part in parts[:-1]:
            cur = cur.setdefault(part, {})
        cur[parts[-1]] = value

    for our_path, fmt in _PATH_MAP.items():
        n = num_vision_layers if "/vision/layers/" in our_path else num_layers
        if "{}" in fmt:
            a_list, b_list = [], []
            for i in range(n):
                mod = fmt.format(i)
                if f"{mod}.lora_A" not in norm:
                    a_list = None
                    break
                a_list.append(norm[f"{mod}.lora_A"].T)
                b_list.append(norm[f"{mod}.lora_B"].T)
            if a_list:
                set_path(our_path, {"a": np.stack(a_list), "b": np.stack(b_list)})
        else:
            if f"{fmt}.lora_A" in norm:
                set_path(our_path, {"a": norm[f"{fmt}.lora_A"].T, "b": norm[f"{fmt}.lora_B"].T})
    return tree, cfg
