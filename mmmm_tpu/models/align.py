"""Stage-0 SAM alignment: train SAM/iSAM against frozen text-prompt embeddings.

Equivalent of ``AlignSam`` / ``AlignInstanceSam`` (``mmmm/models/sam/model.py``):
before coupling with the LLM, the SAM heads learn to accept text-space prompts.
The reference extracts a frozen CLIP text encoder from the SegVol checkpoint
and caches per-class embeddings; here the prompt source is an embedding table
(precomputed from any text encoder, or learned-from-scratch for experiments),
and the trainable state is the SAM tree itself (no LoRA at this stage).

Per-class train-Dice logging (``sam/model.py:141-155``) is reproduced as a
masked per-class running metric.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .segvol import DiceFocalLoss, InstanceSamLoss, SamConfig, instance_sam_forward, sam_forward
from .segvol.loss import masked_mean


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    sam: SamConfig = dataclasses.field(default_factory=SamConfig)
    instance: bool = False
    mask_loss: DiceFocalLoss = dataclasses.field(
        default_factory=lambda: DiceFocalLoss(dice_weight=2, focal_weight=2, focal_gamma=2)
    )
    isam_loss: InstanceSamLoss = dataclasses.field(default_factory=InstanceSamLoss)


def align_training_step(
    sam_params: dict,
    cfg: AlignConfig,
    class_embeddings: jnp.ndarray,  # (num_classes, prompt_dim) frozen
    batch: dict,
    *,
    attn_impl: str = "auto",
    remat: bool = False,
):
    """Loss for one patch batch.

    batch: image (B, C, D, H, W) fp32, patch_size (static), class_idx (B, N),
    class_valid (B, N), masks (B, N, D, H, W) float {0,1}; instance mode adds
    boxes_label (B, L, 6) + index_offsets (B, N, 2).
    """
    prompts = class_embeddings[batch["class_idx"]]  # (B, N, C)
    valid = batch["class_valid"]
    if not cfg.instance:
        masks_logits, _ = sam_forward(
            sam_params, cfg.sam, batch["image"], batch["patch_size"], prompts,
            attn_impl=attn_impl, remat=remat,
        )
        log = cfg.mask_loss.masked(
            masks_logits.astype(jnp.float32), batch["masks"].astype(jnp.float32),
            valid, return_dict=True,
        )
        loss = log.pop("total")
        # per-class positive-dice metric (sam/model.py:141-155)
        dice_per = 1.0 - cfg.mask_loss.dice(
            masks_logits.astype(jnp.float32), batch["masks"].astype(jnp.float32)
        )  # (B, N) dice score
        has_fg = batch["masks"].astype(bool).any(axis=(2, 3, 4)) & valid
        log["dice-pos"] = masked_mean(dice_per, has_fg)
        log["loss"] = loss
        return loss, log
    out = instance_sam_forward(
        sam_params, cfg.sam, batch["image"], batch["patch_size"], prompts,
        attn_impl=attn_impl, remat=remat, upsample_to_image=False,
    )
    def one(i):
        return cfg.isam_loss.sample_loss(
            None, None, out.boxes[i, :, 1:], out.disc_logit[i],
            None, None, batch["boxes_label"][i], batch["index_offsets"][i], valid[i],
        )
    losses, logs = jax.vmap(one)(jnp.arange(batch["image"].shape[0]))
    loss = losses.mean()
    log = {k: v.mean() for k, v in logs.items()}
    log["loss"] = loss
    return loss, log
