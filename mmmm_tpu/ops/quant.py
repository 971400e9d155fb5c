"""Int8 weight-only quantization for serving (W8A16).

Decode on one chip is HBM-bandwidth-bound (~81% of peak reading bf16
weights — ROADMAP round-2 measurement), so halving the bytes per weight is
the one remaining 2x lever. Weights are quantized per output channel to int8
with an fp32 scale; matmuls upcast in VMEM (``x @ q.astype(bf16) * s``), so
HBM traffic halves while the MXU still sees bf16 operands. Activations stay
bf16 — standard weight-only serving quantization, typically <1% quality
delta at 8 bits.

This is an opt-in *serving transform* (``quantize_llm_for_serving``): the
training/parity paths keep exact bf16/fp32 weights; the token-identical
correctness gate applies to the unquantized path.
"""
from __future__ import annotations

import jax.numpy as jnp


def _quantize_2d(w: jnp.ndarray) -> dict:
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(w.astype(jnp.float32) / scale).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.float32)}


def quantize_int8(w: jnp.ndarray, axis: int = -2) -> dict:
    """Per-output-channel symmetric int8: reduces over ``axis`` (the
    contraction dim; -2 = rows of an (in, out) matrix or (L, in, out) stack).
    Returns {"q": int8, "s": fp32 broadcastable scale}.

    Stacked (L, in, out) weights quantize one layer slice at a time: the fp32
    temporaries stay one layer large (~180 MB at flagship shapes) instead of
    the full 2.5 GB stack — the whole transform must fit next to the 13 GB of
    not-yet-freed bf16 weights on a 16 GB chip."""
    if axis != -2:
        raise ValueError("quantize_int8 quantizes over the contraction dim (-2)")
    if w.ndim == 3:
        parts = [_quantize_2d(w[l]) for l in range(w.shape[0])]
        return {
            "q": jnp.stack([p["q"] for p in parts]),
            "s": jnp.stack([p["s"] for p in parts]),
        }
    return _quantize_2d(w)


def _quantize_int4_2d(w: jnp.ndarray, group: int) -> dict:
    from .w4_matmul import pack_int4

    k, n = w.shape
    wf = w.astype(jnp.float32).reshape(k // group, group, n)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int8).reshape(k, n)
    return {"q4": pack_int4(q), "s4": scale[:, 0].astype(jnp.float32)}


def quantize_int4(w: jnp.ndarray, group: int = 128) -> dict:
    """Group-wise symmetric int4 over the contraction dim (group rows share
    one fp32 scale per output column). Returns {"q4": packed (K/2, N) int8,
    "s4": (K/group, N) fp32} for ``qdot``/``w4_matmul``. Quarter the HBM
    bytes of bf16; needs the fused Pallas kernel to pay off (see
    ``w4_matmul`` docstring). Requires 2*group | K and 256 | N (kernel tile;
    every CogVLM expert weight satisfies both — the 32008-col lm_head does
    not and stays int8)."""
    if w.shape[-2] % (2 * group):
        raise ValueError(f"K={w.shape[-2]} not divisible by 2*group={2*group}")
    if w.shape[-1] % 256:
        raise ValueError(f"N={w.shape[-1]} not divisible by the 256 kernel tile")
    if w.ndim == 3:
        parts = [_quantize_int4_2d(w[l], group) for l in range(w.shape[0])]
        return {
            "q4": jnp.stack([p["q4"] for p in parts]),
            "s4": jnp.stack([p["s4"] for p in parts]),
        }
    return _quantize_int4_2d(w, group)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and ("q" in w or "q4" in w) and ("s" in w or "s4" in w)


def qdot(x: jnp.ndarray, w, act_quant: bool = False) -> jnp.ndarray:
    """x @ w for plain or quantized weights; the dequant scale applies after
    the matmul (int8) or inside the fused kernel (int4) so the quantized
    tensor is what streams from HBM.

    ``act_quant=True`` (int8 weights only): W8A8 — dynamically quantize the
    activations per row and contract with a NATIVE int8 x int8 MXU matmul
    (int32 accumulation), rescaling by ``sx * s`` afterwards. The W8A16 form
    (``x @ q.astype(bf16) * s``) pays an int8->bf16 retile on every weight
    read that caps it at ~0.45 of the HBM roofline at decode M
    (PROBE_QDOT_r04); the native int8 dot reads the int8 bytes with no
    dequant at all. Adds per-row 8-bit activation error (~0.4% relative) —
    an opt-in serving mode (MMMM_W8A8), never the parity path."""
    if not is_quantized(w):
        return jnp.dot(x, w)
    if act_quant and "q" in w:
        from jax import lax

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        amax = jnp.max(jnp.abs(x2).astype(jnp.float32), axis=1, keepdims=True)
        sx = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.round(x2.astype(jnp.float32) / sx).astype(jnp.int8)
        y32 = lax.dot_general(
            xq, w["q"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (y32.astype(jnp.float32) * sx * jnp.squeeze(w["s"], axis=-2)).astype(x.dtype)
        return y.reshape(*lead, y.shape[-1])
    if "q4" in w:
        import jax

        from .w4_matmul import w4_matmul, w4_matmul_xla

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        m, n = x2.shape[0], w["q4"].shape[-1]
        m_pad = (-m) % (8 if m <= 256 else 256)  # kernel m-tile
        if m_pad:
            x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
        fn = w4_matmul if jax.default_backend() == "tpu" else w4_matmul_xla
        y = fn(x2, w["q4"], w["s4"])
        return y[:m].reshape(*lead, n)
    y = jnp.dot(x, w["q"].astype(x.dtype))
    return y * jnp.squeeze(w["s"], axis=-2).astype(y.dtype)


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slot symmetric int8 over the head dim: (..., D) -> (int8 (..., D),
    bf16 scale (..., 1)). Halves KV-cache HBM *capacity* (2x context length /
    pool slots per byte); measured NOT a speed option at any length — the
    (S, D) int8->f32 casts are VPU work that scales with S exactly like the
    read stream they save (see ROADMAP). One scale per (batch, head, slot)
    keeps the quantization error per-token local."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def dequantize_kv(q: jnp.ndarray, s: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * s.astype(jnp.float32)).astype(dtype)


_LLM_QUANT_KEYS = (
    "lang_qkv", "lang_dense", "vis_qkv", "vis_dense",
)
_MLP_QUANT_KEYS = ("gate", "up", "down")


def quantize_llm_for_serving(
    params: dict, release_originals: bool = True, bits: int = 8
) -> dict:
    """Return the CogVLM params with the LLM expert weights and the lm_head
    int8-quantized ({"q", "s"} leaves the decoder consumes via ``qdot``).
    Embeddings, norms, RoPE and the ViT stay bf16 (the ViT is FLOPs-bound in
    prefill, not bandwidth-bound).

    ``bits=4``: expert weights go to group-128 int4 (W4A16, the fused Pallas
    ``w4_matmul`` path — quarter the decode weight reads); the lm_head stays
    int8 (its 32008 columns don't tile, and greedy argmax is the most
    quantization-sensitive op in the serving path).

    ``release_originals=True`` (default) converts tensor-by-tensor, dropping
    each bf16 original before the next one quantizes — otherwise originals and
    copies coexist (~20 GB at flagship scale) and the transform itself OOMs a
    16 GB chip. The input tree's inner dicts are mutated in that mode; pass
    False to leave ``params`` untouched (tests, small models)."""
    out = dict(params)
    llm = dict(params["llm"])
    src_layers = llm["layers"] if release_originals else dict(llm["layers"])
    layers = dict(src_layers)

    def convert(container, key, force8: bool = False):
        w = container.pop(key) if release_originals else container[key]
        q = quantize_int8(w) if bits == 8 or force8 else quantize_int4(w)
        del w
        return q

    for key in _LLM_QUANT_KEYS:
        layers[key] = convert(src_layers, key)
    for mlp_key in ("lang_mlp", "vis_mlp"):
        src_mlp = src_layers[mlp_key] if release_originals else dict(src_layers[mlp_key])
        mlp = dict(src_mlp)
        for k in _MLP_QUANT_KEYS:
            mlp[k] = convert(src_mlp, k)
        layers[mlp_key] = mlp
    llm["layers"] = layers
    # pop from the ORIGINAL dict so the bf16 head actually frees
    llm["lm_head"] = convert(params["llm"], "lm_head", force8=True)
    out["llm"] = llm
    return out
