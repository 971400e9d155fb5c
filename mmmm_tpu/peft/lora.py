"""LoRA as a parameter-tree transformation.

The reference wires PEFT's ``get_peft_model`` around torch modules with
module-walking target selection (``mmmm/utils.py:19-57``: LoRA on VLM Linear
layers, full finetuning for SAM/iSAM/vg_proj/embeddings). The TPU-native
formulation works on the parameter pytree directly:

  - ``lora_init`` creates {path: {"a": (.., in, r), "b": (.., r, out)}} factors
    for every targeted weight (B zero-initialized, so step 0 == base model);
  - ``lora_merge`` computes ``W + scale * A @ B`` for the forward pass — the
    merge is a rank-r matmul, negligible next to the forward FLOPs, and keeps
    every model function unchanged;
  - ``split_trainable``/``merge_trainable`` partition the full tree into the
    trainable subset (LoRA factors + fully-finetuned modules) and the frozen
    remainder, the functional analog of ``requires_grad_``.

Scale: ``alpha / r``, or ``alpha / sqrt(r)`` with rsLoRA
(``conf/lora.yaml``: r=64, alpha=8, rsLoRA).
"""
from __future__ import annotations

import dataclasses
import math
import re
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 64
    alpha: float = 8.0
    use_rslora: bool = True
    dropout: float = 0.05  # LoRA-branch input dropout (conf/lora.yaml); see lora_merge

    @property
    def scale(self) -> float:
        return self.alpha / math.sqrt(self.r) if self.use_rslora else self.alpha / self.r


def _flatten(tree: dict, prefix: str = "") -> dict[str, Any]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _set_path(tree: dict, path: str, value) -> None:
    keys = path.split("/")
    for k in keys[:-1]:
        tree = tree.setdefault(k, {})
    tree[keys[-1]] = value


def default_lora_targets(params: dict) -> list[str]:
    """Paths of CogVLM weight matrices to factorize.

    Mirrors ``get_lora_modules_default`` semantics for the phase-vg setup
    (``lora_lang=True``): every Linear weight in the LLM + ViT (+ lm_head),
    excluding norms, biases, embeddings, and position embeddings.
    """
    targets = []
    pat = re.compile(
        r"cogvlm/(llm/layers/(vis|lang)_(qkv|dense)"
        r"|llm/layers/(vis|lang)_mlp/(gate|up|down)"
        r"|llm/lm_head"
        r"|vision/layers/(qkv_w|dense_w|fc1_w|fc2_w)"
        r"|vision/glu/(linear_proj|gate|h4h|4hh))$"
    )
    for path, leaf in _flatten(params).items():
        if pat.match(path) and leaf.ndim >= 2:
            targets.append(path)
    return sorted(targets)


# modules fully finetuned rather than LoRA'd (mmmm.py:157-165: SAM, iSAM,
# vg_proj, and the resized token embeddings)
FINETUNE_PATH_PREFIXES = ("sam", "isam", "vg_proj", "cogvlm/llm/embed_tokens")


def lora_init(key, params: dict, cfg: LoraConfig, targets: list[str] | None = None) -> dict:
    if targets is None:
        targets = default_lora_targets(params)
    flat = _flatten(params)
    lora: dict = {}
    keys = jax.random.split(key, max(len(targets), 1))
    for k, path in zip(keys, targets):
        w = flat[path]
        *batch_dims, fan_in, fan_out = w.shape
        a = jax.random.normal(k, (*batch_dims, fan_in, cfg.r)) * (1.0 / math.sqrt(fan_in))
        b = jnp.zeros((*batch_dims, cfg.r, fan_out))
        _set_path(lora, path, {"a": a.astype(w.dtype), "b": b.astype(w.dtype)})
    return lora


def lora_merge(params: dict, lora: dict, cfg: LoraConfig, *, dropout_rng=None) -> dict:
    """Return a params tree with ``W + scale * A @ B`` at each factored path.

    When ``dropout_rng`` is given and ``cfg.dropout > 0``, applies LoRA-branch
    input dropout (the reference trains with PEFT ``lora_dropout=0.05``,
    ``conf/lora.yaml``): fan-in rows of A are zeroed with prob p and survivors
    scaled by 1/(1-p), a fresh mask per call / per (stacked) layer. This is the
    merge-then-forward realization of ``scale * B A dropout(x)`` — identical in
    expectation; the mask is shared across tokens of the step (a per-token mask
    is inexpressible once W is merged). Pass ``dropout_rng=None`` (the default)
    for eval/inference: the merge is then deterministic and dropout-free.
    """
    flat_lora = {}
    for path, leaf in _flatten(lora).items():
        base_path, name = path.rsplit("/", 1)
        flat_lora.setdefault(base_path, {})[name] = leaf
    flat = _flatten(params)
    merged: dict = {}
    p = cfg.dropout if dropout_rng is not None else 0.0
    for i, (path, w) in enumerate(sorted(flat.items())):
        if path in flat_lora:
            ab = flat_lora[path]
            a = ab["a"]
            if p > 0.0:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, i), 1.0 - p, (*a.shape[:-1], 1)
                )
                a = a * keep.astype(a.dtype) / (1.0 - p)
            delta = jnp.einsum("...ir,...ro->...io", a, ab["b"]) * cfg.scale
            w = w + delta.astype(w.dtype)
        _set_path(merged, path, w)
    return merged


def split_trainable(params: dict, prefixes=FINETUNE_PATH_PREFIXES) -> tuple[dict, dict]:
    """(finetune_subtree, frozen_subtree) partition by path prefix."""
    finetune: dict = {}
    frozen: dict = {}
    for path, leaf in _flatten(params).items():
        target = finetune if path.startswith(prefixes) else frozen
        _set_path(target, path, leaf)
    return finetune, frozen


def merge_trainable(finetune: dict, frozen: dict) -> dict:
    out: dict = {}
    for path, leaf in _flatten(frozen).items():
        _set_path(out, path, leaf)
    for path, leaf in _flatten(finetune).items():
        _set_path(out, path, leaf)
    return out
