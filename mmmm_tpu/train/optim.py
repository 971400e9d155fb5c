"""Optimizer: AdamW + warmup-cosine, no-weight-decay masking, grad clipping.

Mirrors the reference schedule (``conf/phase-vg/fit.yaml:23-41``): AdamW
lr 5e-5 / wd 0.01, timm ``CosineLRScheduler`` with linear warmup, global grad
norm clip 1.0. Parameters the reference marks ``NoWeightDecayParameter``
(norm scales, biases, position/cls/boi/eoi embeddings, decoder tokens) are
excluded from decay by path rules.
"""
from __future__ import annotations

import dataclasses
import re

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 5e-5
    weight_decay: float = 0.01
    warmup_steps: int = 2000
    max_steps: int = 40000
    min_lr_ratio: float = 0.0
    grad_clip_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


_NO_DECAY = re.compile(
    r".*(_b|/b\d?|bias|ln\w*|norm\w*|input_ln|post_ln|pos|cls|cls_pos|boi|eoi"
    r"|iou_token|mask_tokens|no_mask_embed|pe_gaussian)$"
)


def _decay_mask(params):
    def flag(path_entries, leaf):
        parts = []
        for e in path_entries:
            if hasattr(e, "key"):
                parts.append(str(e.key))
        path = "/".join(parts)
        return getattr(leaf, "ndim", 0) >= 2 and not _NO_DECAY.match(path)

    return jax.tree_util.tree_map_with_path(flag, params)


def make_schedule(cfg: OptimizerConfig):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=max(cfg.warmup_steps, 1),
        decay_steps=max(cfg.max_steps, cfg.warmup_steps + 1),
        end_value=cfg.lr * cfg.min_lr_ratio,
    )


def make_optimizer(cfg: OptimizerConfig):
    schedule = make_schedule(cfg)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            schedule,
            b1=cfg.b1,
            b2=cfg.b2,
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            mask=_decay_mask,
        ),
    )
