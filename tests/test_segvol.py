"""SegVol SAM/iSAM tests: shapes, prompt PE convention, set-loss vs scipy reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.models.segvol import (
    DiceFocalLoss,
    InstanceSamLoss,
    SamConfig,
    init_sam_params,
    instance_sam_forward,
    sam_forward,
)
from mmmm_tpu.models.segvol.loss import box_pair_giou_3d, masked_mean, sigmoid_focal_loss


@pytest.fixture(scope="module")
def tiny():
    cfg = SamConfig.tiny()
    params = init_sam_params(jax.random.PRNGKey(0), cfg, instance=True)
    return cfg, params


def test_sam_forward_shapes(tiny):
    cfg, params = tiny
    b, n = 2, 3
    img = jnp.ones((b, 3, 4, 16, 16), jnp.float32)
    prompts = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, n, cfg.embed_dim)), jnp.float32
    )
    full, low = sam_forward(params, cfg, img, (2, 4, 4), prompts, attn_impl="xla")
    # grid (2, 4, 4); patch_z=2 < 2**(0+1)=2? no: threshold up1 is 2 -> 2>=2 ok, up2 threshold 4 -> collapse
    assert full.shape == (b, n, 4, 16, 16)
    assert low.shape[:2] == (b, n)
    assert np.isfinite(np.asarray(full)).all()


def test_instance_sam_forward_shapes(tiny):
    cfg, params = tiny
    b, n, k = 2, 3, cfg.num_instances
    img = jnp.ones((b, 3, 4, 16, 16), jnp.float32)
    prompts = jnp.zeros((b, n, cfg.embed_dim), jnp.float32)
    out = instance_sam_forward(params, cfg, img, (2, 4, 4), prompts, attn_impl="xla")
    assert out.boxes.shape == (b, n, k + 1, 6)
    assert out.disc_logit.shape == (b, n, k)
    assert out.masks_logits.shape[:3] == (b, n, k + 1)
    assert (np.asarray(out.boxes) >= 0).all() and (np.asarray(out.boxes) <= 1).all()


def test_upsample_z_collapse_behavior(tiny):
    """patch_z=1: both upsample stages collapse z; patch_z=4: z doubles twice."""
    cfg, params = tiny
    img = jnp.ones((1, 3, 2, 16, 16), jnp.float32)
    prompts = jnp.zeros((1, 1, cfg.embed_dim), jnp.float32)
    _, low1 = sam_forward(params, cfg, img, (1, 4, 4), prompts, attn_impl="xla", upsample_to_image=False)
    assert low1.shape == (1, 1, 2, 16, 16)  # z stays 2 (grid z), h/w x4
    img2 = jnp.ones((1, 3, 8, 16, 16), jnp.float32)
    _, low2 = sam_forward(params, cfg, img2, (4, 4, 4), prompts, attn_impl="xla", upsample_to_image=False)
    assert low2.shape == (1, 1, 8, 16, 16)  # grid z=2 upsampled x4


def test_giou_3d_basics():
    a = jnp.asarray([[0.5, 0.5, 0.5, 0.2, 0.2, 0.2]])
    np.testing.assert_allclose(np.asarray(box_pair_giou_3d(a, a)), [1.0], atol=1e-6)
    b = jnp.asarray([[0.9, 0.9, 0.9, 0.05, 0.05, 0.05]])
    assert float(box_pair_giou_3d(a, b)[0]) < 0.0  # disjoint -> negative


def _scipy_reference_loss(loss_cfg, boxes_reg, disc_logit, boxes_label, index_offsets, valid):
    """Reference-style dynamic implementation (``sam.py:178-361``, box path)."""
    from scipy.optimize import linear_sum_assignment

    n, k = disc_logit.shape
    all_disc_labels, all_disc_logits = [], []
    pos_pairs = []
    for i in range(n):
        if not valid[i]:
            continue
        lo, hi = index_offsets[i]
        num_pos = min(max(hi - lo, 0), k)
        p = 1 / (1 + np.exp(-disc_logit[i]))
        cost = np.zeros((k, k))
        for q in range(k):
            for m in range(k):
                if m < num_pos:
                    cost[q, m] = loss_cfg.disc_weight * (1 - p[q])
                    l1 = np.abs(boxes_reg[i, q] - boxes_label[lo + m]).mean()
                    giou = float(
                        box_pair_giou_3d(
                            jnp.asarray(boxes_reg[i, q]), jnp.asarray(boxes_label[lo + m])
                        )
                    )
                    cost[q, m] += loss_cfg.box_l1_weight * l1 + loss_cfg.box_giou_weight * (1 - giou)
                else:
                    cost[q, m] = loss_cfg.disc_weight * p[q]
        row, col = linear_sum_assignment(cost)
        match = np.empty(k, np.int64)
        match[row] = col
        for q in range(k):
            is_pos = match[q] < num_pos
            all_disc_labels.append(float(is_pos))
            all_disc_logits.append(disc_logit[i, q])
            if is_pos:
                pos_pairs.append((boxes_reg[i, q], boxes_label[lo + match[q]]))
    dl = np.asarray(all_disc_logits, np.float32)
    dt = np.asarray(all_disc_labels, np.float32)
    disc = np.asarray(
        sigmoid_focal_loss(jnp.asarray(dl), jnp.asarray(dt), loss_cfg.disc_focal_gamma, loss_cfg.disc_focal_alpha)
    ).mean()
    total = loss_cfg.disc_weight * disc
    if pos_pairs:
        br = np.stack([p[0] for p in pos_pairs])
        bl = np.stack([p[1] for p in pos_pairs])
        l1 = np.abs(br - bl).mean(-1).mean()
        giou = 1 - np.asarray(box_pair_giou_3d(jnp.asarray(br), jnp.asarray(bl))).mean()
        total += loss_cfg.box_l1_weight * l1 + loss_cfg.box_giou_weight * giou
    return total


def test_instance_loss_matches_scipy_reference():
    rng = np.random.default_rng(7)
    n, k, lmax = 3, 4, 8
    loss_cfg = InstanceSamLoss(mask_loss=DiceFocalLoss())
    boxes_reg = rng.uniform(0.2, 0.8, size=(n, k, 6)).astype(np.float32)
    disc = rng.normal(size=(n, k)).astype(np.float32)
    boxes_label = rng.uniform(0.2, 0.8, size=(lmax, 6)).astype(np.float32)
    # target 0: labels [0, 2); target 1: none; target 2 (invalid): garbage
    offsets = np.asarray([[0, 2], [2, 2], [0, 0]], np.int64)
    valid = np.asarray([True, True, False])

    got, _ = loss_cfg.sample_loss(
        None,
        None,
        jnp.asarray(boxes_reg),
        jnp.asarray(disc),
        None,
        None,
        jnp.asarray(boxes_label),
        jnp.asarray(offsets),
        jnp.asarray(valid),
    )
    want = _scipy_reference_loss(loss_cfg, boxes_reg, disc, boxes_label, offsets, valid)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_dice_focal_masked():
    rng = np.random.default_rng(8)
    logits = jnp.asarray(rng.normal(size=(2, 3, 4, 8, 8)), jnp.float32)
    target = jnp.asarray(rng.uniform(size=(2, 3, 4, 8, 8)) > 0.7, jnp.float32)
    valid = jnp.asarray([[True, True, False], [True, False, False]])
    loss = DiceFocalLoss()
    d = loss.masked(logits, target, valid, return_dict=True)
    assert set(d) == {"dice", "focal-2.0", "total"}
    # equals mean over only the valid channels
    per = np.asarray(loss.per_channel(logits, target))
    manual = (
        2.0 * np.asarray(loss.dice(logits, target))[np.asarray(valid)].mean()
        + 2.0 * np.asarray(loss.focal(logits, target))[np.asarray(valid)].mean()
    )
    np.testing.assert_allclose(float(d["total"]), manual, rtol=1e-5)
    assert per.shape == (2, 3)


def test_masked_mean_empty_mask_is_zero():
    x = jnp.ones((3, 4))
    assert float(masked_mean(x, jnp.zeros((3, 4), bool))) == 0.0
