"""Torch-numerics parity harness (the offline route to the token-identical gate).

Strategy: independent *torch* mirrors of the reference modules (math
transcribed from the cited reference lines — the reference itself needs
xformers/CUDA and cannot be imported) generate state dicts in the HF/SegVol
checkpoint key format; ``import_cogvlm`` / ``import_segvol_sam`` map them into
the JAX tree (including the 2-D -> 3-D surgery rules), and both forwards run
on the same inputs. Any divergence in an importer mapping, a surgery rule, or
a forward-math detail fails these tests.

Reference math mirrored here:
  - RMSNorm fp32 variance              modeling_cogvlm.py:30-41
  - rotate-half RoPE by position id    modeling_cogvlm.py:145-193
  - expert-mask off-by-one + padding   modeling_cogvlm.py:58-70
  - dual-expert attention/MLP          modeling_cogvlm.py:72-98,228-284
  - decoder layer + final norm + head  modeling_cogvlm.py:286-340,601-706
  - EVA post-norm layer / GLU / pool   visual.py:79-208
  - patch/pos-embed 2-D->3-D surgery   visual.py:37-57, resample.py:31-62
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mmmm_tpu.models.cogvlm import CogVLMConfig, VisionConfig, cogvlm_forward
from mmmm_tpu.train.import_torch import import_cogvlm

torch.manual_seed(0)


# --------------------------------------------------------------------------
# torch mirrors (fp32, functional over the HF-format state dict)
# --------------------------------------------------------------------------

def t_rms_norm(x, w, eps=1e-6):
    var = x.float().pow(2).mean(-1, keepdim=True)
    return (w * (x.float() * torch.rsqrt(var + eps))).to(x.dtype)


def t_rotate_half(x):
    h = x.shape[-1] // 2
    return torch.cat([-x[..., h:], x[..., :h]], dim=-1)


def t_rope_tables(max_pos, dim, base=10000.0):
    inv = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
    t = torch.arange(max_pos).float()
    freqs = torch.outer(t, inv)
    emb = torch.cat([freqs, freqs], dim=-1)
    return emb.cos(), emb.sin()


def t_apply_rope(q, k, cos, sin, pos):
    # q, k: (B, H, S, D); pos: (B, S)
    c = F.embedding(pos, cos)[:, None]
    s = F.embedding(pos, sin)[:, None]
    return q * c + t_rotate_half(q) * s, k * c + t_rotate_half(k) * s


def t_expert_mask(tt, padding):
    vis = torch.zeros_like(tt, dtype=torch.bool)
    vis[:, :-1] = (tt[:, :-1] == 1) & (tt[:, 1:] == 1)
    lang = ~vis
    if tt.shape[1] > 1:
        vis = vis & padding
        lang = lang & padding
    return vis, lang


def t_causal_attention(q, k, v, padding):
    # (B, H, S, D); causal within each sample's valid tokens, fp32 softmax
    scale = q.shape[-1] ** -0.5
    s = q.shape[2]
    scores = (q * scale) @ k.transpose(-1, -2)
    causal = torch.tril(torch.ones(s, s, dtype=torch.bool))
    mask = causal[None, None] & padding[:, None, None, :]
    scores = scores.masked_fill(~mask, float("-inf"))
    probs = scores.float().softmax(-1).to(q.dtype)
    probs = torch.nan_to_num(probs)  # fully-masked (pad) query rows
    return probs @ v


def torch_llm_forward(sd, cfg, embeds, tt, pos, padding):
    """Mirror of CogVLMModel.llm_forward + lm_head (modeling_cogvlm.py:477-586)."""
    b, s, c = embeds.shape
    h, d = cfg.num_attention_heads, cfg.head_dim
    cos, sin = t_rope_tables(cfg.max_position_embeddings, d)
    x = embeds
    vis, lang = t_expert_mask(tt, padding)

    def dual(t, wv, wl):
        out = torch.zeros(*t.shape[:-1], wv.shape[0], dtype=t.dtype)
        out[vis] = t[vis] @ wv.T
        out[lang] = t[lang] @ wl.T
        return out

    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        res = x
        xn = torch.where(
            padding[..., None], t_rms_norm(x, sd[p + "input_layernorm.weight"], cfg.rms_norm_eps), x
        )
        qkv = dual(
            xn,
            sd[p + "self_attn.vision_expert_query_key_value.weight"],
            sd[p + "self_attn.language_expert_query_key_value.weight"],
        )
        q, k, v = [
            t.reshape(b, s, h, d).permute(0, 2, 1, 3) for t in qkv.split(c, dim=-1)
        ]
        q, k = t_apply_rope(q, k, cos, sin, pos)
        ctx = t_causal_attention(q, k, v, padding).permute(0, 2, 1, 3).reshape(b, s, c)
        attn_out = dual(
            ctx,
            sd[p + "self_attn.vision_expert_dense.weight"],
            sd[p + "self_attn.language_expert_dense.weight"],
        )
        x = res + attn_out
        res = x
        xn = torch.where(
            padding[..., None],
            t_rms_norm(x, sd[p + "post_attention_layernorm.weight"], cfg.rms_norm_eps),
            x,
        )

        def mlp(t, pre):
            gate = t @ sd[p + f"mlp.{pre}.gate_proj.weight"].T
            up = t @ sd[p + f"mlp.{pre}.up_proj.weight"].T
            return (F.silu(gate) * up) @ sd[p + f"mlp.{pre}.down_proj.weight"].T

        out = torch.zeros_like(xn)
        out[vis] = mlp(xn[vis], "vision_mlp")
        out[lang] = mlp(xn[lang], "language_mlp")
        x = res + out
    x = t_rms_norm(x, sd["model.norm.weight"], cfg.rms_norm_eps)
    logits = (x @ sd["lm_head.weight"].T).float()
    return x, logits


def torch_vit_surgery(sd, cfg):
    """The reference's 2-D checkpoint adaptation, in torch (visual.py:37-57,
    resample.py:31-53): pos grid bilinear-resampled + z-repeated; patch conv
    HW-resampled with response scaling then mean-inflated over z."""
    v = cfg.vision
    out = dict(sd)
    vp = "model.vision."
    pos = sd[vp + "patch_embedding.position_embedding.weight"]
    cls_pos, grid = pos[:1], pos[1:]
    h0, w0 = v.pt_pos_embed_shape
    grid = grid.reshape(h0, w0, -1).permute(2, 0, 1)[None]
    if (h0, w0) != tuple(v.pos_embed_shape[1:]):
        grid = F.interpolate(grid, v.pos_embed_shape[1:], mode="bilinear", align_corners=False)
    grid = grid[:, :, None].expand(-1, -1, v.pos_embed_shape[0], -1, -1).contiguous()
    out["__pos3d"] = grid
    out["__cls_pos"] = cls_pos

    w = sd[vp + "patch_embedding.proj.weight"]
    if w.shape[2:] != tuple(v.patch_size[1:]):
        old = w.shape[2] * w.shape[3]
        w = F.interpolate(w, v.patch_size[1:], mode="bilinear", align_corners=False)
        w = w * (old / (v.patch_size[1] * v.patch_size[2]))
    w = (w / v.patch_size[0])[:, :, None].expand(-1, -1, v.patch_size[0], -1, -1).contiguous()
    out["__proj3d"] = w
    return out


def torch_vit_forward(sd, cfg, image, patch_size, pool_size):
    """Mirror of EVA2CLIPModel (visual.py:59-208) on the surgered 3-D weights."""
    v = cfg.vision
    vp = "model.vision."
    w = sd["__proj3d"]
    if w.shape[2] != patch_size[0]:
        assert w.shape[2] % patch_size[0] == 0
        w = w.reshape(
            w.shape[0], w.shape[1], patch_size[0], w.shape[2] // patch_size[0], *w.shape[3:]
        ).sum(3)
    x = F.conv3d(image, w, sd[vp + "patch_embedding.proj.bias"], stride=patch_size)
    pos = F.interpolate(sd["__pos3d"], x.shape[2:], mode="trilinear", align_corners=False)
    x = (x + pos).flatten(2).transpose(1, 2)  # (B, T, C)
    cls = sd[vp + "patch_embedding.cls_embedding"].reshape(1, -1) + sd["__cls_pos"]
    x = torch.cat([cls[None].expand(x.shape[0], -1, -1), x], dim=1)

    b, s, c = x.shape
    nh = v.num_heads
    for i in range(v.num_hidden_layers):
        p = f"{vp}transformer.layers.{i}."
        qkv = x @ sd[p + "attention.query_key_value.weight"].T + sd[p + "attention.query_key_value.bias"]
        q, k, vv = [
            t.reshape(b, s, nh, c // nh).permute(0, 2, 1, 3) for t in qkv.split(c, dim=-1)
        ]
        scores = (q * (c // nh) ** -0.5) @ k.transpose(-1, -2)
        attn = scores.float().softmax(-1).to(q.dtype) @ vv
        attn = attn.permute(0, 2, 1, 3).reshape(b, s, c)
        attn = attn @ sd[p + "attention.dense.weight"].T + sd[p + "attention.dense.bias"]
        # post-norm quirk: residual + LN(sublayer_out)
        x = x + F.layer_norm(
            attn, (c,), sd[p + "input_layernorm.weight"], sd[p + "input_layernorm.bias"], v.layer_norm_eps
        )
        h = F.gelu(x @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"])
        h = h @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]
        x = x + F.layer_norm(
            h, (c,), sd[p + "post_attention_layernorm.weight"], sd[p + "post_attention_layernorm.bias"], v.layer_norm_eps
        )

    x = x[:, 1:]
    grid = tuple(i // p for i, p in zip(image.shape[2:], patch_size))
    if any(p > 1 for p in pool_size):
        x = x.transpose(1, 2).reshape(b, c, *grid)
        x = F.max_pool3d(x, pool_size)
        x = x.flatten(2).transpose(1, 2)
    x = x @ sd[vp + "linear_proj.linear_proj.weight"].T
    x = F.gelu(
        F.layer_norm(
            x, (x.shape[-1],), sd[vp + "linear_proj.norm1.weight"], sd[vp + "linear_proj.norm1.bias"]
        )
    )
    x = F.silu(x @ sd[vp + "linear_proj.gate_proj.weight"].T) * (
        x @ sd[vp + "linear_proj.dense_h_to_4h.weight"].T
    )
    x = x @ sd[vp + "linear_proj.dense_4h_to_h.weight"].T
    boi = sd[vp + "boi"].reshape(1, 1, -1).expand(b, -1, -1)
    eoi = sd[vp + "eoi"].reshape(1, 1, -1).expand(b, -1, -1)
    return torch.cat([boi, x, eoi], dim=1)


# --------------------------------------------------------------------------
# state-dict builder (HF checkpoint key format, 2-D vision weights)
# --------------------------------------------------------------------------

def make_cogvlm_state_dict(cfg: CogVLMConfig, gen):
    c, i, L, voc = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers, cfg.vocab_size
    v = cfg.vision
    vc, vi, vL = v.hidden_size, v.intermediate_size, v.num_hidden_layers

    def r(*shape):
        return torch.from_numpy(gen.standard_normal(shape).astype(np.float32) * 0.05)

    sd = {
        "model.embed_tokens.weight": r(voc, c),
        "model.norm.weight": 1 + 0.1 * r(c),
        "lm_head.weight": r(voc, c),
    }
    for li in range(L):
        p = f"model.layers.{li}."
        sd[p + "self_attn.vision_expert_query_key_value.weight"] = r(3 * c, c)
        sd[p + "self_attn.language_expert_query_key_value.weight"] = r(3 * c, c)
        sd[p + "self_attn.vision_expert_dense.weight"] = r(c, c)
        sd[p + "self_attn.language_expert_dense.weight"] = r(c, c)
        for pre in ("vision_mlp", "language_mlp"):
            sd[p + f"mlp.{pre}.gate_proj.weight"] = r(i, c)
            sd[p + f"mlp.{pre}.up_proj.weight"] = r(i, c)
            sd[p + f"mlp.{pre}.down_proj.weight"] = r(c, i)
        sd[p + "input_layernorm.weight"] = 1 + 0.1 * r(c)
        sd[p + "post_attention_layernorm.weight"] = 1 + 0.1 * r(c)

    vp = "model.vision."
    h0, w0 = v.pt_pos_embed_shape
    sd[vp + "patch_embedding.position_embedding.weight"] = r(1 + h0 * w0, vc)
    sd[vp + "patch_embedding.proj.weight"] = r(vc, v.in_channels, 4, 4)  # 2-D ckpt kernel
    sd[vp + "patch_embedding.proj.bias"] = r(vc)
    sd[vp + "patch_embedding.cls_embedding"] = r(vc)
    for li in range(vL):
        p = f"{vp}transformer.layers.{li}."
        sd[p + "attention.query_key_value.weight"] = r(3 * vc, vc)
        sd[p + "attention.query_key_value.bias"] = r(3 * vc)
        sd[p + "attention.dense.weight"] = r(vc, vc)
        sd[p + "attention.dense.bias"] = r(vc)
        sd[p + "input_layernorm.weight"] = 1 + 0.1 * r(vc)
        sd[p + "input_layernorm.bias"] = 0.1 * r(vc)
        sd[p + "post_attention_layernorm.weight"] = 1 + 0.1 * r(vc)
        sd[p + "post_attention_layernorm.bias"] = 0.1 * r(vc)
        sd[p + "mlp.fc1.weight"] = r(vi, vc)
        sd[p + "mlp.fc1.bias"] = r(vi)
        sd[p + "mlp.fc2.weight"] = r(vc, vi)
        sd[p + "mlp.fc2.bias"] = r(vc)
    sd[vp + "linear_proj.linear_proj.weight"] = r(c, vc)
    sd[vp + "linear_proj.norm1.weight"] = 1 + 0.1 * r(c)
    sd[vp + "linear_proj.norm1.bias"] = 0.1 * r(c)
    sd[vp + "linear_proj.gate_proj.weight"] = r(i, c)
    sd[vp + "linear_proj.dense_h_to_4h.weight"] = r(i, c)
    sd[vp + "linear_proj.dense_4h_to_h.weight"] = r(c, i)
    sd[vp + "boi"] = r(1, 1, c)
    sd[vp + "eoi"] = r(1, 1, c)
    return sd


CFG = CogVLMConfig(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=128,
    vision=VisionConfig(
        hidden_size=24,
        intermediate_size=40,
        num_hidden_layers=2,
        num_heads=4,
        patch_size=(2, 6, 6),       # z_max 2; HW 6 != ckpt 4 -> exercises resample
        pos_embed_shape=(2, 4, 4),  # 5x5 ckpt grid -> 4x4 = a true downsample
        pt_pos_embed_shape=(5, 5),
    ),
)


@pytest.fixture(scope="module")
def imported():
    gen = np.random.default_rng(7)
    sd = make_cogvlm_state_dict(CFG, gen)
    params = import_cogvlm({k: v.numpy() for k, v in sd.items()}, CFG)
    params = jax.tree.map(jnp.asarray, params)
    return sd, params


def test_resample_matches_torch_interpolate():
    """resample_nd == F.interpolate(align_corners=False) in all regimes,
    including downsampling (where jax.image.resize would anti-alias)."""
    from mmmm_tpu.ops.resample import resample_nd

    gen = np.random.default_rng(0)
    x2 = gen.standard_normal((1, 3, 5, 5)).astype(np.float32)
    for tgt in [(4, 4), (8, 8), (7, 3), (32, 32)]:
        got = np.asarray(resample_nd(jnp.asarray(x2), tgt))
        want = F.interpolate(torch.from_numpy(x2), tgt, mode="bilinear", align_corners=False)
        np.testing.assert_allclose(got, want.numpy(), atol=2e-6)
    x3 = gen.standard_normal((1, 2, 4, 6, 6)).astype(np.float32)
    for tgt in [(2, 4, 4), (8, 8, 8), (3, 5, 7)]:
        got = np.asarray(resample_nd(jnp.asarray(x3), tgt))
        want = F.interpolate(torch.from_numpy(x3), tgt, mode="trilinear", align_corners=False)
        np.testing.assert_allclose(got, want.numpy(), atol=2e-6)


def test_surgery_rules_match_torch(imported):
    """Importer's pos-embed inflation + conv resample/inflation == the same
    rules computed with torch ops (visual.py:37-57, resample.py:31-53)."""
    sd, params = imported
    tsd = torch_vit_surgery(sd, CFG)
    np.testing.assert_allclose(
        np.asarray(params["vision"]["patch"]["pos"]), tsd["__pos3d"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(params["vision"]["patch"]["proj_w"]), tsd["__proj3d"].numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["vision"]["patch"]["cls_pos"]), tsd["__cls_pos"].numpy(), atol=0
    )


@pytest.mark.parametrize("patch_z", [2, 1])
def test_vit_forward_parity(imported, patch_z):
    """JAX ViT == torch mirror on the surgered weights, incl. the runtime
    z-kernel collapse (patch_z=1 sums the stored z=2 kernel)."""
    sd, params = imported
    tsd = torch_vit_surgery(sd, CFG)
    gen = np.random.default_rng(3)
    image = gen.standard_normal((2, 3, 2, 24, 24)).astype(np.float32)
    patch = (patch_z, 6, 6)
    pool = (1, 2, 2)
    want = torch_vit_forward(tsd, CFG, torch.from_numpy(image), patch, pool).numpy()

    from mmmm_tpu.models.cogvlm.vit import vit_forward

    got = np.asarray(
        jax.jit(
            lambda p, im: vit_forward(p, CFG, im, patch, pool, attn_impl="xla")
        )(params["vision"], jnp.asarray(image))
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_full_forward_parity(imported):
    """End-to-end (embed -> vision splice -> dual-expert decoder -> fp32
    logits): JAX forward == torch mirror to ~1e-4, valid positions, both
    a full-length and a padded sample."""
    sd, params = imported
    tsd = torch_vit_surgery(sd, CFG)
    gen = np.random.default_rng(11)
    b = 2
    patch, pool = (2, 6, 6), (1, 2, 2)
    image = gen.standard_normal((b, 3, 2, 24, 24)).astype(np.float32)
    vis_tok = torch_vit_forward(tsd, CFG, torch.from_numpy(image), patch, pool)
    n_vis = vis_tok.shape[1]  # boi + 4 + eoi = 6

    s = 16
    ids = gen.integers(0, CFG.vocab_size, size=(b, s)).astype(np.int32)
    tt = np.zeros((b, s), np.int32)
    tt[:, 1 : 1 + n_vis] = 1
    # CogVLM position scheme: bos=0, boi=1, patches share 2, eoi=3, text 4...
    pos = np.zeros((b, s), np.int32)
    pos[:, 1] = 1
    pos[:, 2 : n_vis] = 2
    pos[:, n_vis] = 3
    pos[:, n_vis + 1 :] = 4 + np.arange(s - n_vis - 1)
    valid_len = np.asarray([s, s - 3])
    padding = (np.arange(s)[None] < valid_len[:, None])

    # torch: embed, splice, forward
    emb = F.embedding(torch.from_numpy(ids.astype(np.int64)), tsd["model.embed_tokens.weight"])
    emb = torch.cat([emb[:, :1], vis_tok, emb[:, 1 + n_vis :]], dim=1)
    _, want_logits = torch_llm_forward(
        tsd, CFG, emb, torch.from_numpy(tt.astype(np.int64)),
        torch.from_numpy(pos.astype(np.int64)), torch.from_numpy(padding),
    )

    segs = padding.astype(np.int32)
    got_hidden, got_logits = jax.jit(
        lambda p, *a: cogvlm_forward(p, CFG, *a, patch, pool, attn_impl="xla")
    )(
        params, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(pos),
        jnp.asarray(segs), jnp.asarray(image),
    )
    got_logits = np.asarray(got_logits)
    for bi in range(b):
        np.testing.assert_allclose(
            got_logits[bi, : valid_len[bi]],
            want_logits.numpy()[bi, : valid_len[bi]],
            atol=2e-4, rtol=1e-3,
        )


def test_inflate_conv_z_center_even_odd():
    """Center inflation == the reference rule for odd and even depths
    (resample.py:40-49)."""
    from mmmm_tpu.train.import_torch import inflate_conv_z

    w = np.random.default_rng(0).standard_normal((2, 3, 4, 4)).astype(np.float32)
    odd = inflate_conv_z(w, 3, "center")
    assert odd.shape == (2, 3, 3, 4, 4)
    np.testing.assert_array_equal(odd[:, :, 1], w)
    np.testing.assert_array_equal(odd[:, :, 0], 0)
    even = inflate_conv_z(w, 4, "center")
    np.testing.assert_array_equal(even[:, :, 1], w / 2)
    np.testing.assert_array_equal(even[:, :, 2], w / 2)
    np.testing.assert_array_equal(even[:, :, 0], 0)
    # sum over z preserves the 2-D response in both modes
    np.testing.assert_allclose(inflate_conv_z(w, 4, "mean").sum(2), w, atol=1e-6)
    np.testing.assert_allclose(even.sum(2), w, atol=1e-6)
