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


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def qdot(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w for plain or quantized weights; the dequant scale applies after
    the matmul so the int8 tensor is what streams from HBM."""
    if not is_quantized(w):
        return jnp.dot(x, w)
    y = jnp.dot(x, w["q"].astype(x.dtype))
    return y * jnp.squeeze(w["s"], axis=-2).astype(y.dtype)


def quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slot symmetric int8 over the head dim: (..., D) -> (int8 (..., D),
    bf16 scale (..., 1)). Decode is HBM-bound on cache reads at long S; int8
    KV halves that traffic (the ROADMAP 'next 2x at long S' lever). One scale
    per (batch, head, slot) keeps the quantization error per-token local."""
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


def quantize_llm_for_serving(params: dict, release_originals: bool = True) -> dict:
    """Return the CogVLM params with the LLM expert weights and the lm_head
    int8-quantized ({"q", "s"} leaves the decoder consumes via ``qdot``).
    Embeddings, norms, RoPE and the ViT stay bf16 (the ViT is FLOPs-bound in
    prefill, not bandwidth-bound).

    ``release_originals=True`` (default) converts tensor-by-tensor, dropping
    each bf16 original before the next one quantizes — otherwise originals and
    copies coexist (~20 GB at flagship scale) and the transform itself OOMs a
    16 GB chip. The input tree's inner dicts are mutated in that mode; pass
    False to leave ``params`` untouched (tests, small models)."""
    out = dict(params)
    llm = dict(params["llm"])
    src_layers = llm["layers"] if release_originals else dict(llm["layers"])
    layers = dict(src_layers)

    def convert(container, key):
        w = container.pop(key) if release_originals else container[key]
        q = quantize_int8(w)
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
    llm["lm_head"] = convert(params["llm"], "lm_head")
    out["llm"] = llm
    return out
