"""Grounding losses: Dice-focal mask loss and DETR-style instance set loss.

Equivalents of ``mmmm/models/loss.py`` and ``InstanceSamLoss``
(``mmmm/models/segvol/modeling/sam.py:100-392``), restructured for static
shapes: every sample carries a padded (N_targets, ...) axis with a validity
mask, per-target positive-label counts come from ``index_offsets``, and the
Hungarian step is the exact in-jit enumeration from ``ops.hungarian`` — no
SciPy host sync. ``num_uncertain`` is fixed at 0, matching the shipped code
path (``sam.py:301``).

Reductions: masked means, so padded targets/queries contribute nothing — the
SPMD-static analog of the reference's DDP dummy-forward hacks.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...ops import hungarian

_EPS = 1e-8


def sigmoid_focal_loss(logits, targets, gamma: float, alpha: float | None = None):
    """Elementwise focal loss (luolib.losses semantics)."""
    p = jax.nn.sigmoid(logits)
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = bce * (1 - p_t) ** gamma
    if alpha is not None:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    return loss


def _bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def masked_mean(x, mask, axis=None):
    mask = mask.astype(x.dtype)
    return (x * mask).sum(axis) / jnp.maximum(mask.sum(axis), 1.0)


@dataclasses.dataclass(frozen=True)
class DiceFocalLoss:
    """Dice (no-smooth-numerator) + sigmoid focal (``mmmm/models/loss.py:13-83``)."""

    dice_weight: float = 2.0
    focal_weight: float = 2.0
    focal_gamma: float = 2.0
    focal_alpha: float | None = None

    def dice(self, logits, target):
        """logits/target (..., *spatial) -> (...,) per-channel dice loss.

        ``target=None`` (all-negative) yields 1 per the reference fix."""
        if target is None:
            return jnp.ones(logits.shape[: logits.ndim - 3], logits.dtype)
        spatial = tuple(range(logits.ndim - 3, logits.ndim))
        p = jax.nn.sigmoid(logits)
        inter = (target * p).sum(spatial)
        denom = target.sum(spatial) + p.sum(spatial)
        return 1.0 - 2.0 * inter / jnp.clip(denom, min=_EPS)

    def focal(self, logits, target):
        spatial = tuple(range(logits.ndim - 3, logits.ndim))
        if target is None:
            target = jnp.zeros_like(logits)
        if self.focal_gamma < _EPS:
            per = _bce(logits, target)
        else:
            per = sigmoid_focal_loss(logits, target, self.focal_gamma, self.focal_alpha)
        return per.mean(spatial)

    def per_channel(self, logits, target):
        """(..., D, H, W) -> per-channel (...,) total loss (no reduction)."""
        return self.dice_weight * self.dice(logits, target) + self.focal_weight * self.focal(
            logits, target
        )

    def masked(self, logits, target, valid, return_dict: bool = False):
        """Masked-mean total over a padded channel axis; `valid` broadcasts to
        the non-spatial shape of ``logits``."""
        dice = masked_mean(self.dice(logits, target), valid)
        focal = masked_mean(self.focal(logits, target), valid)
        total = self.dice_weight * dice + self.focal_weight * focal
        if return_dict:
            key = "ce" if self.focal_gamma < _EPS else f"focal-{self.focal_gamma:.1f}"
            return {"dice": dice, key: focal, "total": total}
        return total


# ---------------------------------------------------------------------------
# 3-D box utilities (CenterSize mode, normalized coordinates)
# ---------------------------------------------------------------------------

def center_size_to_corners(boxes):
    """(..., 6) (cx, cy, cz, sx, sy, sz) -> (min (..., 3), max (..., 3))."""
    center, size = boxes[..., :3], boxes[..., 3:]
    return center - size / 2, center + size / 2


def box_pair_giou_3d(a, b):
    """Pairwise-elementwise GIoU of two (..., 6) CenterSize box arrays."""
    a_min, a_max = center_size_to_corners(a)
    b_min, b_max = center_size_to_corners(b)
    inter = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), min=0).prod(-1)
    vol_a = jnp.clip(a_max - a_min, min=0).prod(-1)
    vol_b = jnp.clip(b_max - b_min, min=0).prod(-1)
    union = vol_a + vol_b - inter
    iou = inter / jnp.clip(union, min=_EPS)
    enclose = jnp.clip(jnp.maximum(a_max, b_max) - jnp.minimum(a_min, b_min), min=0).prod(-1)
    return iou - (enclose - union) / jnp.clip(enclose, min=_EPS)


@dataclasses.dataclass(frozen=True)
class InstanceSamLoss:
    """DETR-style set loss with per-target Hungarian matching.

    Config mirrors ``conf/phase-vg/model.yaml``: box L1 5, GIoU 2, disc 2,
    focal gamma 2 / alpha 0.85, ``match_ce=True`` (1-p matching cost).
    """

    mask_loss: DiceFocalLoss | None = None
    use_neg_mask: bool = False
    box_l1_weight: float = 5.0
    box_giou_weight: float = 2.0
    disc_weight: float = 2.0
    disc_focal_gamma: float = 2.0
    disc_focal_alpha: float | None = 0.85
    match_ce: bool = True

    def _box_cost(self, boxes_reg, labels):
        """(K, 6) x (K, 6) -> (K_query, K_label) L1+GIoU cost."""
        l1 = jnp.abs(boxes_reg[:, None, :] - labels[None, :, :]).mean(-1)
        giou = 1.0 - box_pair_giou_3d(boxes_reg[:, None, :], labels[None, :, :])
        return self.box_l1_weight * l1 + self.box_giou_weight * giou

    def match_one_target(
        self,
        boxes_reg,  # (K, 6)
        disc_logit,  # (K,)
        boxes_label_g,  # (K, 6) gathered labels (cols >= num_pos are garbage)
        num_pos,  # scalar int
        masks_ds=None,  # (K, d, h, w) query mask logits (downsampled)
        masks_label_ds=None,  # (K, d, h, w) gathered label masks
    ):
        """Returns (K,) matched column per query (cols >= num_pos are negatives).

        Mirrors ``_match_instances`` (``sam.py:178-250``) with num_uncertain=0;
        all shapes static, positives selected by ``col < num_pos``.
        """
        k = disc_logit.shape[0]
        col_is_pos = jnp.arange(k) < num_pos
        if self.match_ce:
            p = jax.nn.sigmoid(disc_logit)
            cost_pos = self.disc_weight * (1 - p)
            cost_neg = self.disc_weight * p
        else:
            cost_pos = self.disc_weight * sigmoid_focal_loss(
                disc_logit, jnp.ones_like(disc_logit), self.disc_focal_gamma, self.disc_focal_alpha
            )
            cost_neg = self.disc_weight * sigmoid_focal_loss(
                disc_logit, jnp.zeros_like(disc_logit), self.disc_focal_gamma, self.disc_focal_alpha
            )
        disc_cost = jnp.where(col_is_pos[None, :], cost_pos[:, None], cost_neg[:, None])
        if masks_label_ds is not None:
            pair = jax.vmap(
                lambda m: jax.vmap(lambda t: self.mask_loss.per_channel(m, t))(masks_label_ds)
            )(masks_ds)  # (K, K)
            loc_cost = jnp.where(col_is_pos[None, :], pair, 0.0)
        else:
            pair = self._box_cost(boxes_reg, boxes_label_g)
            loc_cost = jnp.where(col_is_pos[None, :], pair, 0.0)
        col = hungarian(disc_cost + loc_cost)
        return col

    def sample_loss(
        self,
        masks_logits,  # (N, K, D, H, W) full-res instance logits or None
        masks_logits_ds,  # (N, K, d, h, w) or None
        boxes_reg,  # (N, K, 6)
        disc_logit,  # (N, K)
        masks_label,  # (Lmax, D, H, W) or None
        masks_label_ds,  # (Lmax, d, h, w) or None
        boxes_label,  # (Lmax, 6)
        index_offsets,  # (N, 2)
        target_valid,  # (N,) bool
    ):
        """Set loss for one sample with N padded targets; returns (loss, log)."""
        n, k = disc_logit.shape
        disc_logit = disc_logit.astype(jnp.float32)
        boxes_reg = boxes_reg.astype(jnp.float32)
        num_pos = jnp.clip(index_offsets[:, 1] - index_offsets[:, 0], 0, k)  # (N,)
        lmax = boxes_label.shape[0]
        gather_idx = jnp.clip(
            index_offsets[:, :1] + jnp.arange(k)[None, :], 0, max(lmax - 1, 0)
        )  # (N, K)
        labels_g = boxes_label[gather_idx]  # (N, K, 6)

        if masks_label_ds is not None:
            masks_label_g = masks_label_ds[gather_idx].astype(jnp.float32)  # (N, K, d, h, w)
            match = jax.vmap(
                lambda br, dl, lg, npos, mq, ml: self.match_one_target(br, dl, lg, npos, mq, ml)
            )(boxes_reg, disc_logit, labels_g, num_pos, masks_logits_ds.astype(jnp.float32), masks_label_g)
        else:
            match = jax.vmap(self.match_one_target)(boxes_reg, disc_logit, labels_g, num_pos)
        match = jax.lax.stop_gradient(match)  # (N, K) matched label column
        match_is_pos = match < num_pos[:, None]  # (N, K)
        valid_q = jnp.broadcast_to(target_valid[:, None], (n, k))
        pos_q = match_is_pos & valid_q

        log = {}
        # discrimination loss over all certain (== all valid) queries
        disc_per = sigmoid_focal_loss(
            disc_logit, match_is_pos.astype(jnp.float32), self.disc_focal_gamma, self.disc_focal_alpha
        )
        disc_loss = masked_mean(disc_per, valid_q)
        log[f"instance-disc-focal-{self.disc_focal_gamma:.1f}"] = disc_loss
        loss = self.disc_weight * disc_loss

        # box regression over positive matches
        matched_idx = jnp.take_along_axis(gather_idx, match, axis=1)  # (N, K) label rows
        matched_boxes = boxes_label[matched_idx]  # (N, K, 6)
        l1 = masked_mean(jnp.abs(boxes_reg - matched_boxes).mean(-1), pos_q)
        giou = masked_mean(1.0 - box_pair_giou_3d(boxes_reg, matched_boxes), pos_q)
        has_pos = pos_q.any()
        box_loss = jnp.where(has_pos, self.box_l1_weight * l1 + self.box_giou_weight * giou, 0.0)
        if masks_label is None:
            loss = loss + box_loss
            log["instance-box-l1"] = l1
            log["instance-box-giou"] = giou
        else:
            matched_masks = masks_label[matched_idx].astype(jnp.float32)  # (N, K, D, H, W)
            mask_per = self.mask_loss.per_channel(masks_logits.astype(jnp.float32), matched_masks)
            mask_loss_pos = masked_mean(mask_per, pos_q)
            loss = loss + jnp.where(has_pos, mask_loss_pos, 0.0)
            log["instance-mask-pos"] = mask_loss_pos
            if self.use_neg_mask:
                neg_per = self.mask_loss.per_channel(masks_logits.astype(jnp.float32), None)  # (N, K)
                neg_q = (~match_is_pos) & valid_q
                loss = loss + masked_mean(neg_per, neg_q)
        return loss, log
