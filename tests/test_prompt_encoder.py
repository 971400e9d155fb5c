"""SAM point/box/mask prompt encoders (ref ``segvol/modeling/
prompt_encoder.py:16-151``) + prompted segmentation end to end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.models.segvol import (
    SamConfig,
    encode_box_prompt,
    encode_mask_prompt,
    encode_point_prompt,
    encode_prompts,
    init_sam_params,
    sam_forward_prompted,
)
from mmmm_tpu.models.segvol.decoder import init_prompt_encoder_params


def _tiny_cfg():
    return SamConfig(
        in_channels=1, embed_dim=64, encoder_num_layers=2, encoder_num_heads=2,
        encoder_mlp_ratio=2, patch_size=(4, 16, 16), pos_embed_shape=(4, 8, 8),
        num_instances=2, decoder_depth=2, decoder_num_heads=2, decoder_mlp_dim=64,
    )


def _torch_pe(gaussian, coords, image_size):
    """Reference forward_with_coords math (prompt_encoder.py:191-200)."""
    h, w, d = image_size
    c = coords.copy().astype(np.float64)
    c[..., 0] /= w
    c[..., 1] /= h
    c[..., 2] /= d
    c = 2 * c - 1
    proj = 2 * np.pi * (c @ np.asarray(gaussian, np.float64))
    return np.concatenate([np.sin(proj), np.cos(proj)], -1)


def test_point_prompt_matches_reference_math():
    cfg = _tiny_cfg()
    p = init_prompt_encoder_params(jax.random.PRNGKey(0), cfg)
    pts = np.asarray([[10.0, 20.0, 3.0], [5.0, 5.0, 1.0]], np.float32)
    labels = np.asarray([1, 0], np.int32)
    size = (64, 64, 16)  # (H, W, D)
    out = np.asarray(encode_point_prompt(p, jnp.asarray(pts), jnp.asarray(labels), size))
    assert out.shape == (3, cfg.embed_dim)  # padding point appended
    want = _torch_pe(p["pe_gaussian"], pts + 0.5, size)
    want[0] += np.asarray(p["point_embeddings"][1])  # pos
    want[1] += np.asarray(p["point_embeddings"][0])  # neg
    np.testing.assert_allclose(out[:2], want, rtol=2e-5, atol=2e-5)
    # the padding row is exactly not_a_point (PE zeroed, ref :78-80)
    np.testing.assert_allclose(out[2], np.asarray(p["not_a_point_embed"]), rtol=1e-6)


def test_box_prompt_corner_identities():
    cfg = _tiny_cfg()
    p = init_prompt_encoder_params(jax.random.PRNGKey(1), cfg)
    boxes = np.asarray([[4.0, 8.0, 1.0, 40.0, 50.0, 12.0]], np.float32)
    size = (64, 64, 16)
    out = np.asarray(encode_box_prompt(p, jnp.asarray(boxes), size))
    assert out.shape == (2, cfg.embed_dim)
    want = _torch_pe(p["pe_gaussian"], (boxes + 0.5).reshape(1, 2, 3), size)[0]
    want[0] += np.asarray(p["point_embeddings"][2])
    want[1] += np.asarray(p["point_embeddings"][3])
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)


def test_mask_prompt_shape():
    cfg = _tiny_cfg()
    p = init_prompt_encoder_params(jax.random.PRNGKey(2), cfg)
    mask = jnp.zeros((1, 8, 32, 32))
    dense = encode_mask_prompt(p, mask)
    assert dense.shape == (cfg.embed_dim, 2, 8, 8)


def test_encode_prompts_order_and_fallback():
    cfg = _tiny_cfg()
    p = init_prompt_encoder_params(jax.random.PRNGKey(3), cfg)
    size = (64, 64, 16)
    pts = (jnp.asarray([[1.0, 2.0, 3.0]]), jnp.asarray([1]))
    boxes = jnp.asarray([[0.0, 0.0, 0.0, 10.0, 10.0, 5.0]])
    text = jnp.ones((cfg.embed_dim,))
    sparse, dense = encode_prompts(
        p, (4, 8, 8), size, points=pts, boxes=boxes, text_embedding=text,
    )
    # with boxes present, points are NOT padded: 1 point + 2 corners + 1 text
    assert sparse.shape == (4, cfg.embed_dim)
    assert dense.shape == (cfg.embed_dim, 4, 8, 8)
    with pytest.raises(ValueError):
        encode_prompts(p, (4, 8, 8), size)


def test_prompted_segmentation_end_to_end():
    cfg = _tiny_cfg()
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    image = jnp.zeros((1, 1, 16, 64, 64))
    boxes = jnp.asarray([[8.0, 8.0, 2.0, 48.0, 48.0, 12.0]])
    full, low = jax.jit(
        lambda img: sam_forward_prompted(params, cfg, img, (4, 16, 16), boxes=boxes)
    )(image)
    assert full.shape == (16, 64, 64)
    assert np.isfinite(np.asarray(full)).all()
