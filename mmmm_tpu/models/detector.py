"""DINO-style deformable detector for pseudo-box labeling (2-D X-ray).

TPU-native replacement for the reference's detrex DINO-EVA detector, which is
trained on VinDr-CXR fused boxes and run over tagged MIMIC-CXR studies to
produce the ``{key}_box.json`` inputs of the instance-grounding stage-3 data
path (``scripts/data/vg/MIMIC-CXR/detrex/tools/MIMIC-CXR-vg/infer.py:1-135``,
CUDA core ``detrex/detrex/layers/csrc/MsDeformAttn/ms_deform_attn_cuda.cu``).

Design (all static shapes, jit/pjit-friendly):
  - small conv backbone (strides 8/16/32) with GroupNorm;
  - deformable-attention encoder over the multi-scale token stream
    (``ops/deform_attn.ms_deform_attn`` — gathers+lerps XLA fuses; no custom
    kernel needed at pseudo-labeling scale);
  - two-stage query selection: per-token proposals, top-Q by class score,
    mixed with learned content queries (DINO-style);
  - iterative box-refinement decoder (self-attention + deformable
    cross-attention around the current reference boxes);
  - set loss with exact rectangular assignment (``ops/hungarian.
    lap_rectangular``) — no host sync, unlike scipy-based DETR matchers.

Class vocabulary: the VinDr-CXR findings mapped to taxonomy names, as in the
reference infer script's ``local_labels`` (``infer.py:18-42``).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deform_attn import ms_deform_attn
from ..ops.hungarian import lap_rectangular

# VinDr-CXR finding -> taxonomy name (ref infer.py:18-42; "Other lesion" is
# dropped there too). Order defines the class-id space of the detector.
VINDR_CLASSES = [
    "aortic enlargement", "atelectasis", "calcification", "cardiomegaly",
    "clavicle fracture", "pulmonary consolidation", "pulmonary edema",
    "pulmonary emphysema", "pulmonary artery enlargement",
    "interstitial lung disease", "pulmonary infiltrate", "pulmonary cavity",
    "pulmonary cyst", "pulmonary opacification", "mediastinal shift",
    "lung nodule",
    "pleural effusion", "pleural thickening", "pneumothorax",
    "pulmonary fibrosis", "rib fracture",
]


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    num_classes: int = len(VINDR_CLASSES)
    d_model: int = 128
    n_heads: int = 8
    n_points: int = 4
    enc_layers: int = 3
    dec_layers: int = 3
    ffn_dim: int = 512
    num_queries: int = 100
    backbone_dims: tuple[int, ...] = (32, 64, 128, 128)  # /4 /8 /16 /32
    image_size: int = 512
    max_gt: int = 24  # static padded GT slots per image
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    cost_class: float = 2.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0

    @property
    def n_levels(self) -> int:
        return 3  # /8, /16, /32

    def level_shapes(self) -> list[tuple[int, int]]:
        return [(self.image_size // s, self.image_size // s) for s in (8, 16, 32)]


# ---------------------------------------------------------------- primitives

def _linear(rng, d_in, d_out, scale=None):
    scale = scale if scale is not None else d_in ** -0.5
    return {
        "w": jax.random.normal(rng, (d_in, d_out)) * scale,
        "b": jnp.zeros((d_out,)),
    }


def _apply_linear(p, x):
    return x @ p["w"] + p["b"]


def _mlp(rng, dims):
    ks = jax.random.split(rng, len(dims) - 1)
    return [_linear(k, a, b) for k, a, b in zip(ks, dims[:-1], dims[1:])]


def _apply_mlp(layers, x):
    for i, p in enumerate(layers):
        x = _apply_linear(p, x)
        if i + 1 < len(layers):
            x = jax.nn.relu(x)
    return x


def _layernorm_params(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _layernorm(p, x, eps=1e-5):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _groupnorm(p, x, groups=8, eps=1e-5):
    b, h, w, c = x.shape
    g = x.reshape(b, h, w, groups, c // groups)
    m = g.mean((1, 2, 4), keepdims=True)
    v = ((g - m) ** 2).mean((1, 2, 4), keepdims=True)
    g = (g - m) * jax.lax.rsqrt(v + eps)
    return g.reshape(b, h, w, c) * p["scale"] + p["bias"]


def _conv_params(rng, kh, kw, c_in, c_out):
    fan = kh * kw * c_in
    return {
        "w": jax.random.normal(rng, (kh, kw, c_in, c_out)) * (2.0 / fan) ** 0.5,
        "b": jnp.zeros((c_out,)),
    }


def _conv(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x) - jnp.log1p(-x)


def box_cxcywh_to_xyxy(b):
    c, s = b[..., :2], b[..., 2:]
    return jnp.concatenate([c - s / 2, c + s / 2], -1)


def giou_2d(a, b):
    """Generalized IoU of broadcastable (..., 4) xyxy boxes."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    inter = jnp.clip(rb - lt, 0).prod(-1)
    area_a = jnp.clip(a[..., 2:] - a[..., :2], 0).prod(-1)
    area_b = jnp.clip(b[..., 2:] - b[..., :2], 0).prod(-1)
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-9)
    hull_lt = jnp.minimum(a[..., :2], b[..., :2])
    hull_rb = jnp.maximum(a[..., 2:], b[..., 2:])
    hull = jnp.clip(hull_rb - hull_lt, 0).prod(-1)
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def _sine_embed(pos, d):
    """(..., 2) normalized xy -> (..., d) sine/cos embedding (DETR-style:
    d/2 features per axis)."""
    npf = d // 2
    t = 10000 ** (2 * (jnp.arange(npf) // 2) / npf)
    out = []
    for i in range(2):
        x = pos[..., i : i + 1] * 2 * math.pi / t
        out.append(jnp.concatenate([jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])], -1))
    return jnp.concatenate(out, -1)


# ------------------------------------------------------------- param builders

def _deform_attn_params(rng, cfg: DetectorConfig):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    h, l, p = cfg.n_heads, cfg.n_levels, cfg.n_points
    params = {
        "offsets": _linear(k1, cfg.d_model, h * l * p * 2, scale=0.0),
        "weights": _linear(k2, cfg.d_model, h * l * p, scale=0.0),
        "value": _linear(k3, cfg.d_model, cfg.d_model),
        "out": _linear(k4, cfg.d_model, cfg.d_model),
    }
    # deformable-DETR init: point offsets spread on a ring per head
    theta = np.arange(h) * 2 * math.pi / h
    grid = np.stack([np.cos(theta), np.sin(theta)], -1)  # (h, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    init = np.tile(grid[:, None, None, :], (1, l, p, 1))
    init *= np.arange(1, p + 1)[None, None, :, None]
    params["offsets"]["b"] = jnp.asarray(init.reshape(-1), jnp.float32)
    return params


def _mha_params(rng, d):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {"q": _linear(k1, d, d), "k": _linear(k2, d, d),
            "v": _linear(k3, d, d), "out": _linear(k4, d, d)}


def _enc_layer_params(rng, cfg):
    k1, k2 = jax.random.split(rng)
    return {
        "attn": _deform_attn_params(k1, cfg),
        "ln1": _layernorm_params(cfg.d_model),
        "ffn": _mlp(k2, (cfg.d_model, cfg.ffn_dim, cfg.d_model)),
        "ln2": _layernorm_params(cfg.d_model),
    }


def _dec_layer_params(rng, cfg):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "self_attn": _mha_params(k1, cfg.d_model),
        "ln1": _layernorm_params(cfg.d_model),
        "cross_attn": _deform_attn_params(k2, cfg),
        "ln2": _layernorm_params(cfg.d_model),
        "ffn": _mlp(k3, (cfg.d_model, cfg.ffn_dim, cfg.d_model)),
        "ln3": _layernorm_params(cfg.d_model),
        "box_head": _mlp(k4, (cfg.d_model, cfg.d_model, 4)),
    }


def init_detector_params(rng, cfg: DetectorConfig):
    keys = iter(jax.random.split(rng, 64))
    dims = cfg.backbone_dims
    backbone = {
        "stem": _conv_params(next(keys), 7, 7, 1, dims[0]),
        "stem_gn": {"scale": jnp.ones((dims[0],)), "bias": jnp.zeros((dims[0],))},
    }
    for i in range(1, 4):
        backbone[f"down{i}"] = _conv_params(next(keys), 3, 3, dims[i - 1], dims[i])
        backbone[f"gn{i}a"] = {"scale": jnp.ones((dims[i],)), "bias": jnp.zeros((dims[i],))}
        backbone[f"res{i}"] = _conv_params(next(keys), 3, 3, dims[i], dims[i])
        backbone[f"gn{i}b"] = {"scale": jnp.ones((dims[i],)), "bias": jnp.zeros((dims[i],))}
    params = {
        "backbone": backbone,
        "input_proj": [
            {**_linear(next(keys), dims[i], cfg.d_model),
             "gn": _layernorm_params(cfg.d_model)}
            for i in (1, 2, 3)
        ],
        "level_embed": jax.random.normal(next(keys), (cfg.n_levels, cfg.d_model)) * 0.02,
        "encoder": [_enc_layer_params(next(keys), cfg) for _ in range(cfg.enc_layers)],
        "enc_out_ln": _layernorm_params(cfg.d_model),
        "enc_class": _linear(next(keys), cfg.d_model, cfg.num_classes),
        "enc_box": _mlp(next(keys), (cfg.d_model, cfg.d_model, 4)),
        "query_embed": jax.random.normal(next(keys), (cfg.num_queries, cfg.d_model)) * 0.02,
        "ref_point_head": _mlp(next(keys), (cfg.d_model, cfg.d_model, cfg.d_model)),
        "decoder": [_dec_layer_params(next(keys), cfg) for _ in range(cfg.dec_layers)],
        "class_head": _linear(next(keys), cfg.d_model, cfg.num_classes),
    }
    # focal-friendly class bias init (prior prob 0.01)
    bias = -math.log((1 - 0.01) / 0.01)
    params["enc_class"]["b"] = jnp.full((cfg.num_classes,), bias)
    params["class_head"]["b"] = jnp.full((cfg.num_classes,), bias)
    return params


# ------------------------------------------------------------------- forward

def _backbone(params, x):
    p = params["backbone"]
    y = jax.nn.relu(_groupnorm(p["stem_gn"], _conv(p["stem"], x, stride=4)))
    feats = []
    for i in range(1, 4):
        y = jax.nn.relu(_groupnorm(p[f"gn{i}a"], _conv(p[f"down{i}"], y, stride=2)))
        y = y + jax.nn.relu(_groupnorm(p[f"gn{i}b"], _conv(p[f"res{i}"], y)))
        feats.append(y)
    return feats  # /8, /16, /32


def _token_centers(shapes):
    """Normalized (x, y) token centers per level, concatenated."""
    out = []
    for h, w in shapes:
        ys = (jnp.arange(h) + 0.5) / h
        xs = (jnp.arange(w) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        out.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
    return jnp.concatenate(out, 0)  # (T, 2)


def _split_levels(tokens, shapes, heads, head_dim):
    """(B, T, D) -> per level (B, H, W, heads, head_dim)."""
    out, start = [], 0
    b = tokens.shape[0]
    for h, w in shapes:
        lv = tokens[:, start : start + h * w]
        out.append(lv.reshape(b, h, w, heads, head_dim))
        start += h * w
    return out


def _deform_attn(p, cfg, query, value_tokens, ref, shapes, ref_wh=None):
    """Deformable attention: ``ref`` (B, Q, 2) normalized centers.

    When ``ref_wh`` is given (decoder box refine), offsets are scaled by the
    box size; otherwise by the level's token grid (deformable-DETR encoder).
    """
    b, q, _ = query.shape
    h, l, pts = cfg.n_heads, cfg.n_levels, cfg.n_points
    head_dim = cfg.d_model // h
    off = _apply_linear(p["offsets"], query).reshape(b, q, h, l, pts, 2)
    w = _apply_linear(p["weights"], query).reshape(b, q, h, l * pts)
    w = jax.nn.softmax(w, -1).reshape(b, q, h, l, pts)
    values = _apply_linear(p["value"], value_tokens)
    value_levels = _split_levels(values, shapes, h, head_dim)
    if ref_wh is None:
        norm = jnp.asarray([[wl, hl] for hl, wl in shapes], jnp.float32)  # (L, 2)
        loc = ref[:, :, None, None, None, :] + off / norm[None, None, None, :, None, :]
    else:
        scale = (ref_wh / (2 * pts))[:, :, None, None, None, :]
        loc = ref[:, :, None, None, None, :] + off * scale
    out = ms_deform_attn(value_levels, loc, w)
    return _apply_linear(p["out"], out)


def _self_attn(p, x, h):
    b, q, d = x.shape
    hd = d // h

    def heads(t):
        return t.reshape(b, q, h, hd).transpose(0, 2, 1, 3)

    qh = heads(_apply_linear(p["q"], x))
    kh = heads(_apply_linear(p["k"], x))
    vh = heads(_apply_linear(p["v"], x))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd)
    probs = jax.nn.softmax(logits, -1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh).transpose(0, 2, 1, 3).reshape(b, q, d)
    return _apply_linear(p["out"], out)


def detector_forward(params, cfg: DetectorConfig, images):
    """images: (B, H, W, 1) in [0, 1]. Returns dict of per-layer outputs.

    Output boxes are normalized cxcywh; ``class_logits`` are pre-sigmoid.
    """
    feats = _backbone(params, images)
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    b = images.shape[0]
    tokens = []
    for lvl, f in enumerate(feats):
        proj = params["input_proj"][lvl]
        t = _layernorm(proj["gn"], f.reshape(b, -1, f.shape[-1]) @ proj["w"] + proj["b"])
        tokens.append(t + params["level_embed"][lvl])
    x = jnp.concatenate(tokens, 1)  # (B, T, D)
    centers = _token_centers(shapes)[None]  # (1, T, 2)
    pos = _sine_embed(centers, cfg.d_model)

    for layer in params["encoder"]:
        a = _deform_attn(layer["attn"], cfg, x + pos, x,
                         jnp.broadcast_to(centers, (b, *centers.shape[1:])), shapes)
        x = _layernorm(layer["ln1"], x + a)
        x = _layernorm(layer["ln2"], x + _apply_mlp(layer["ffn"], x))

    # two-stage proposals
    memory = _layernorm(params["enc_out_ln"], x)
    enc_logits = _apply_linear(params["enc_class"], memory)  # (B, T, C)
    sizes = jnp.concatenate([
        jnp.full((h * w, 2), 4.0 / max(h, w)) for h, w in shapes
    ])[None]
    anchors = jnp.concatenate([jnp.broadcast_to(centers, (b, *centers.shape[1:])),
                               jnp.broadcast_to(sizes, (b, *sizes.shape[1:]))], -1)
    enc_boxes = jax.nn.sigmoid(
        inverse_sigmoid(anchors) + _apply_mlp(params["enc_box"], memory)
    )  # (B, T, 4) cxcywh
    score = enc_logits.max(-1)
    _, top_idx = jax.lax.top_k(score, cfg.num_queries)  # (B, Q)
    ref = jnp.take_along_axis(enc_boxes, top_idx[..., None], 1)  # (B, Q, 4)
    ref = jax.lax.stop_gradient(ref)
    enc_top_logits = jnp.take_along_axis(enc_logits, top_idx[..., None], 1)

    q = jnp.broadcast_to(params["query_embed"][None], (b, cfg.num_queries, cfg.d_model))
    layer_logits, layer_boxes = [], []
    for layer in params["decoder"]:
        qpos = _apply_mlp(params["ref_point_head"], _sine_embed(ref[..., :2], cfg.d_model))
        q = _layernorm(layer["ln1"], q + _self_attn(layer["self_attn"], q + qpos, cfg.n_heads))
        a = _deform_attn(layer["cross_attn"], cfg, q + qpos, x, ref[..., :2],
                         shapes, ref_wh=ref[..., 2:])
        q = _layernorm(layer["ln2"], q + a)
        q = _layernorm(layer["ln3"], q + _apply_mlp(layer["ffn"], q))
        delta = _apply_mlp(layer["box_head"], q)
        ref = jax.nn.sigmoid(inverse_sigmoid(ref) + delta)
        layer_logits.append(_apply_linear(params["class_head"], q))
        layer_boxes.append(ref)
        ref = jax.lax.stop_gradient(ref)
    return {
        "class_logits": layer_logits[-1],
        "boxes": layer_boxes[-1],
        "aux": list(zip(layer_logits[:-1], layer_boxes[:-1])),
        "enc_logits": enc_top_logits,
        "enc_boxes": jnp.take_along_axis(enc_boxes, top_idx[..., None], 1),
    }


# ----------------------------------------------------------------------- loss

def _focal_loss(logits, targets_onehot, alpha, gamma):
    p = jax.nn.sigmoid(logits)
    ce = jnp.logaddexp(0.0, jnp.where(targets_onehot > 0, -logits, logits))
    pt = jnp.where(targets_onehot > 0, p, 1 - p)
    w = jnp.where(targets_onehot > 0, alpha, 1 - alpha)
    return (w * (1 - pt) ** gamma * ce).sum(-1)


def _match_and_loss(cfg, logits, boxes, gt_boxes, gt_classes, gt_valid):
    """Single-image DETR loss. gt_boxes (K, 4) cxcywh; gt_valid (K,) bool."""
    k = gt_boxes.shape[0]
    prob = jax.nn.sigmoid(logits)  # (Q, C)
    p_gt = prob[:, gt_classes].T  # (K, Q)
    alpha, gamma = cfg.focal_alpha, cfg.focal_gamma
    pos_cost = -alpha * (1 - p_gt) ** gamma * jnp.log(jnp.clip(p_gt, 1e-8))
    neg_cost = -(1 - alpha) * p_gt ** gamma * jnp.log(jnp.clip(1 - p_gt, 1e-8))
    cost_cls = pos_cost - neg_cost
    cost_l1 = jnp.abs(gt_boxes[:, None] - boxes[None]).sum(-1)  # (K, Q)
    cost_giou = -giou_2d(
        box_cxcywh_to_xyxy(gt_boxes)[:, None], box_cxcywh_to_xyxy(boxes)[None]
    )
    cost = (cfg.cost_class * cost_cls + cfg.cost_bbox * cost_l1
            + cfg.cost_giou * cost_giou)
    # padded GT rows get a flat cost so they absorb arbitrary distinct columns
    cost = jnp.where(gt_valid[:, None], cost, 0.0)
    col = lap_rectangular(cost)  # (K,)

    num_gt = jnp.maximum(gt_valid.sum(), 1)
    onehot = jnp.zeros((boxes.shape[0], cfg.num_classes))
    scat = jnp.where(gt_valid, col, boxes.shape[0])  # invalid -> OOB drop
    onehot = onehot.at[scat, gt_classes].set(1.0, mode="drop")
    loss_cls = _focal_loss(logits, onehot, alpha, gamma).sum() / num_gt

    matched = boxes[col]  # (K, 4)
    l1 = jnp.abs(matched - gt_boxes).sum(-1)
    gi = 1 - giou_2d(box_cxcywh_to_xyxy(matched), box_cxcywh_to_xyxy(gt_boxes))
    loss_box = jnp.where(gt_valid, l1, 0.0).sum() / num_gt
    loss_giou = jnp.where(gt_valid, gi, 0.0).sum() / num_gt
    return cfg.cost_class * loss_cls + cfg.cost_bbox * loss_box + cfg.cost_giou * loss_giou


def detector_loss(params, cfg: DetectorConfig, images, gt_boxes, gt_classes, gt_valid):
    """Batched loss incl. aux decoder layers + encoder proposal loss."""
    out = detector_forward(params, cfg, images)
    per_image = jax.vmap(lambda lo, bx, gb, gc, gv: _match_and_loss(cfg, lo, bx, gb, gc, gv))

    total = per_image(out["class_logits"], out["boxes"], gt_boxes, gt_classes, gt_valid)
    for lo, bx in out["aux"]:
        total += per_image(lo, bx, gt_boxes, gt_classes, gt_valid)
    total += per_image(out["enc_logits"], out["enc_boxes"], gt_boxes, gt_classes, gt_valid)
    return total.mean()


# ------------------------------------------------------------------ inference

def select_boxes(
    logits: np.ndarray,  # (Q, C) pre-sigmoid
    boxes: np.ndarray,  # (Q, 4) normalized cxcywh
    tagged_classes: list[str],
    image_hw: tuple[int, int],
    class_names: list[str] = VINDR_CLASSES,
    score_th: float = 0.1,
    topk: int = 100,
) -> dict[str, list[list[float]]]:
    """Reference ``select_instances`` semantics (``infer.py:84-96``): keep
    detections of report-tagged classes with score >= 0.1; if a tagged class
    has detections but none pass, keep its single best. Returns absolute
    xyxy pixel boxes per taxonomy name — the ``{key}_box.json`` contract."""
    prob = 1 / (1 + np.exp(-np.asarray(logits, np.float64)))  # (Q, C)
    q, c = prob.shape
    flat = prob.reshape(-1)
    top = np.argsort(flat)[::-1][:topk]
    scores = flat[top]
    qi, ci = top // c, top % c
    h, w = image_hw
    xyxy = np.asarray(box_cxcywh_to_xyxy(jnp.asarray(boxes)))
    xyxy = np.clip(xyxy, 0, 1) * np.asarray([w, h, w, h])
    out: dict[str, list[list[float]]] = {}
    name_to_idx = {n: i for i, n in enumerate(class_names)}
    for name in tagged_classes:
        idx = name_to_idx.get(name)
        if idx is None:
            continue
        cls_mask = ci == idx
        sel = cls_mask & (scores >= score_th)
        if not sel.any() and cls_mask.any():
            first = np.nonzero(cls_mask)[0][0]
            sel = np.zeros_like(sel)
            sel[first] = True
        if sel.any():
            out[name] = xyxy[qi[sel]].tolist()
    return out


def equalize_image(img: np.ndarray) -> np.ndarray:
    """Histogram equalization over uint8, matching torchvision's
    ``tvtf.equalize`` applied by the reference before inference
    (``infer.py:110-112``)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        lo, hi = float(img.min()), float(img.max())
        img = np.round((img - lo) / max(hi - lo, 1e-8) * 255).astype(np.uint8)
    hist = np.bincount(img.reshape(-1), minlength=256)
    nonzero = hist[hist > 0]
    if nonzero.size <= 1:
        return img
    step = (hist.sum() - nonzero[-1]) // 255
    if step == 0:
        return img
    lut = (np.cumsum(hist) - hist // 2) // step
    lut = np.clip(np.concatenate([[0], lut[:-1]]), 0, 255).astype(np.uint8)
    return lut[img]


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU of xyxy boxes (numpy, eval-time)."""
    import numpy as np

    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def compute_map(
    detections: list[dict],  # per image: {"boxes" (N,4 xyxy), "scores" (N,), "classes" (N,)}
    ground_truths: list[dict],  # per image: {"boxes" (M,4 xyxy), "classes" (M,)}
    num_classes: int,
    iou_th: float = 0.5,
) -> float:
    """mAP@iou_th, VOC all-point interpolation (the detector-quality gauge
    the reference gets from detrex's COCO evaluator)."""
    import numpy as np

    aps = []
    for c in range(num_classes):
        scores, matches, n_gt = [], [], 0
        for det, gt in zip(detections, ground_truths):
            gt_boxes = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)[
                np.asarray(gt["classes"]).reshape(-1) == c
            ]
            n_gt += len(gt_boxes)
            sel = np.asarray(det["classes"]).reshape(-1) == c
            d_boxes = np.asarray(det["boxes"], np.float64).reshape(-1, 4)[sel]
            d_scores = np.asarray(det["scores"], np.float64).reshape(-1)[sel]
            order = np.argsort(-d_scores)
            used = np.zeros(len(gt_boxes), bool)
            for j in order:
                scores.append(d_scores[j])
                if len(gt_boxes) == 0:
                    matches.append(False)
                    continue
                ious = _iou_xyxy(d_boxes[j : j + 1], gt_boxes)[0]
                best = int(np.argmax(ious))
                if ious[best] >= iou_th and not used[best]:
                    used[best] = True
                    matches.append(True)
                else:
                    matches.append(False)
        if n_gt == 0:
            continue
        if not scores:
            aps.append(0.0)
            continue
        order = np.argsort(-np.asarray(scores))
        tp = np.asarray(matches)[order]
        cum_tp = np.cumsum(tp)
        recall = cum_tp / n_gt
        precision = cum_tp / (np.arange(len(tp)) + 1)
        # all-point interpolation
        ap, best_p = 0.0, 0.0
        prev_r = 1.0
        for p, r in zip(precision[::-1], recall[::-1]):
            best_p = max(best_p, p)
            ap += best_p * (prev_r - r)
            prev_r = r
        ap += best_p * prev_r
        aps.append(float(ap))
    return float(np.mean(aps)) if aps else 0.0
