"""CogVLM visual-expert decoder (LLaMA skeleton + per-token-type dual experts).

Re-design of ``mmmm/models/cogvlm/modeling_cogvlm.py:196-340`` for TPU: the
reference routes vision/language tokens through separate QKV/dense/MLP weights
with boolean masked scatters; XLA-hostile. Here both experts run as dense
matmuls over all tokens and the result is selected with ``jnp.where`` — for a
2-way hard-routed expert this is mathematically identical and keeps the MXU
saturated with two big matmuls instead of two gathers + two ragged matmuls.

Faithfully reproduced quirks:
  - expert-mask off-by-one: a token uses the vision expert iff it *and its
    successor* are vision-typed, so ``eoi`` runs through the language expert
    (``modeling_cogvlm.py:58-70``);
  - RoPE indexed by CogVLM's custom position ids (all image patches share one
    position; supplied by the data layer / generation loop);
  - RMSNorm in fp32, logits in fp32.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ...ops import apply_rope, decode_attention, rms_norm, rope_cos_sin, segment_attention
from ...ops.quant import qdot
from ...ops.attention import decode_attention_bhsd
from ...ops.remat import remat_policy
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
from .config import CogVLMConfig

VISION_TOKEN_TYPE = 1
LANGUAGE_TOKEN_TYPE = 0


def vision_expert_mask(token_type_ids: jnp.ndarray) -> jnp.ndarray:
    """(B, S) bool: positions routed to the vision expert.

    CogVLM quirk (``modeling_cogvlm.py:58-70``): vision iff this token AND the
    next one are vision-typed; the last position is always language.
    """
    tt = token_type_ids
    m = (tt[:, :-1] == VISION_TOKEN_TYPE) & (tt[:, 1:] == VISION_TOKEN_TYPE)
    return jnp.pad(m, ((0, 0), (0, 1)), constant_values=False)


def init_llm_params(key, cfg: CogVLMConfig, dtype=jnp.float32) -> dict:
    c, i, L, v = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers, cfg.vocab_size
    ks = iter(jax.random.split(key, 16))
    std = 0.02

    def nrm(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    def expert_mlp(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"gate": nrm(k1, (L, c, i)), "up": nrm(k2, (L, c, i)), "down": nrm(k3, (L, i, c))}

    return {
        "embed_tokens": nrm(next(ks), (v, c)),
        "layers": {
            "vis_qkv": nrm(next(ks), (L, c, 3 * c)),
            "lang_qkv": nrm(next(ks), (L, c, 3 * c)),
            "vis_dense": nrm(next(ks), (L, c, c)),
            "lang_dense": nrm(next(ks), (L, c, c)),
            "vis_mlp": expert_mlp(next(ks)),
            "lang_mlp": expert_mlp(next(ks)),
            "input_ln": jnp.ones((L, c), dtype),
            "post_ln": jnp.ones((L, c), dtype),
        },
        "norm": jnp.ones((c,), dtype),
        "lm_head": nrm(next(ks), (c, v)),
    }


def _dual(x, w_vis, w_lang, vis_mask):
    """Dense 2-way expert: both matmuls, per-token select."""
    out_v = qdot(x, w_vis)
    out_l = qdot(x, w_lang)
    return jnp.where(vis_mask[..., None], out_v, out_l)


def _expert_mlp(x, mp_vis, mp_lang, vis_mask):
    def swiglu(mp):
        return qdot(jax.nn.silu(qdot(x, mp["gate"])) * qdot(x, mp["up"]), mp["down"])

    return jnp.where(vis_mask[..., None], swiglu(mp_vis), swiglu(mp_lang))


def _decoder_layer(
    x,
    lp,
    *,
    cfg: CogVLMConfig,
    vis_mask,
    segments,
    position_ids,
    cos,
    sin,
    attn_impl: str,
    cache=None,  # optional (k_cache, v_cache, cache_index) for decode
    lang_only: bool = False,
    expert_span: tuple[int, int] | None = None,
):
    """One visual-expert decoder layer.

    ``lang_only=True`` statically drops the vision-expert matmuls: during
    decode the expert mask is provably all-False (a token is vision-typed only
    if its *successor* is vision-typed, and every generated token is
    language-typed — ``modeling_cogvlm.py:62-64``), so reading the vision
    expert's weights would only burn HBM bandwidth.

    ``expert_span=(lo, hi)`` statically slices the sequence into
    lang/vis/lang contiguous runs instead of computing both experts' matmuls
    for every token and selecting — halving prefill expert FLOPs. Only valid
    when every batch row routes exactly [lo, hi) to the vision expert (the
    single-image serving layout; callers derive it from the vision-token
    span with the off-by-one rule).
    """
    b, s, c = x.shape
    h, d = cfg.num_attention_heads, cfg.head_dim
    if lang_only:
        # decode is HBM-bound on the weight stream; MMMM_W8A8=1 swaps the
        # W8A16 dequant matmuls (int8->bf16 retile caps them at ~0.45 of
        # roofline at decode M, PROBE_QDOT_r04) for native int8 x int8 MXU
        # dots with dynamic per-row activation scales (see ops/quant.qdot).
        # Decode-only: prefill is compute-bound and gains nothing; the
        # lm_head stays W8A16 (greedy argmax is the most quantization-
        # sensitive op in the serving path).
        a8 = os.environ.get("MMMM_W8A8", "0") == "1"
        qd = partial(qdot, act_quant=a8)
        dual = lambda t, wv, wl: qd(t, wl)
        mlp = lambda t: qd(
            jax.nn.silu(qd(t, lp["lang_mlp"]["gate"])) * qd(t, lp["lang_mlp"]["up"]),
            lp["lang_mlp"]["down"],
        )
    elif expert_span is not None:
        lo, hi = expert_span
        # MMMM_W8A8_PREFILL=1: native int8 x int8 prefill matmuls with
        # dynamic per-row activation scales. Re-probed at prefill M=2304
        # (PROBE_PREFILL_r05 qdot rows): W8A8 0.571 ms vs bf16/W8A16
        # 1.09-1.10 at 4096x11008 — ~the v5e int8 MXU peak (the r3
        # "int8 == bf16 rate" verdict was a decode/4096^3-M artifact).
        # Opt-in: adds ~0.4% per-row activation error; no-op for
        # unquantized (training) weights. lm_head stays W8A16.
        qd = partial(
            qdot, act_quant=os.environ.get("MMMM_W8A8_PREFILL", "0") == "1"
        )

        def dual(t, wv, wl):
            return jnp.concatenate(
                [qd(t[:, :lo], wl), qd(t[:, lo:hi], wv), qd(t[:, hi:], wl)],
                axis=1,
            )

        def mlp(t):
            def sw(seg, mp):
                return qd(
                    jax.nn.silu(qd(seg, mp["gate"])) * qd(seg, mp["up"]),
                    mp["down"],
                )

            return jnp.concatenate(
                [sw(t[:, :lo], lp["lang_mlp"]), sw(t[:, lo:hi], lp["vis_mlp"]),
                 sw(t[:, hi:], lp["lang_mlp"])],
                axis=1,
            )
    else:
        dual = lambda t, wv, wl: _dual(t, wv, wl, vis_mask)
        mlp = lambda t: _expert_mlp(t, lp["vis_mlp"], lp["lang_mlp"], vis_mask)
    residual = x
    x = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
    qkv = dual(x, lp["vis_qkv"], lp["lang_qkv"])
    q, k, v = [t.reshape(b, s, h, d) for t in jnp.split(qkv, 3, axis=-1)]
    q, k = apply_rope(q, k, cos, sin, position_ids)
    if cache is None:
        ctx = segment_attention(q, k, v, segments, causal=True, impl=attn_impl)
        ctx = _checkpoint_name(ctx, "attn_out")
        new_cache = (k, v)
    else:
        # caches live in the decode-friendly (B, H, Smax, D) layout; either a
        # (k, v) bf16 pair or an int8-quantized dict {"kq","ks","vq","vs"}
        # (per-slot scales) — int8 halves the bandwidth-bound cache reads
        # write_index: (B,). kv_len: (B,) single-token, or (B, Sq) per-window-
        # position valid lengths (speculative verify: position j attends slots
        # < write_index + j + 1 — causal within the window, full to the prefix)
        kv_cache, write_index, kv_len = cache
        upd = jax.vmap(  # per sample: (H, Smax, ...) updated at slot axis 1
            lambda c, u, i: jax.lax.dynamic_update_slice_in_dim(c, u, i, axis=1)
        )
        # the Pallas decode kernels are single-token; k-token verify windows
        # take the XLA bhsd path (logits (B, H, k, Smax) — modest at decode S)
        use_pallas = s == 1 and (
            attn_impl == "pallas"
            or (attn_impl == "auto" and jax.default_backend() == "tpu")
        )
        if isinstance(kv_cache, dict):
            from ...ops.quant import dequantize_kv, quantize_kv

            kq_new, ks_new = quantize_kv(jnp.swapaxes(k, 1, 2))  # (B, H, 1, D/1)
            vq_new, vs_new = quantize_kv(jnp.swapaxes(v, 1, 2))
            if use_pallas and os.environ.get("MMMM_KV_APPEND", "1") == "1":
                # same scatter→full-cache-copy pathology as the bf16 path
                # below, and worse here: int8 KV is the long-context option,
                # so the per-step copy scales with the (large) Smax
                from ...ops.decode_kernel import kv_append_pallas_q8

                new_cache = kv_append_pallas_q8(
                    kv_cache, kq_new, ks_new, vq_new, vs_new, write_index
                )
            else:
                new_cache = {
                    "kq": upd(kv_cache["kq"], kq_new, write_index),
                    "ks": upd(kv_cache["ks"], ks_new, write_index),
                    "vq": upd(kv_cache["vq"], vq_new, write_index),
                    "vs": upd(kv_cache["vs"], vs_new, write_index),
                }
            if use_pallas:
                from ...ops.decode_kernel import decode_attention_pallas_q8

                ctx = decode_attention_pallas_q8(
                    q, new_cache["kq"], new_cache["ks"],
                    new_cache["vq"], new_cache["vs"], kv_len,
                )
            else:
                smax = new_cache["kq"].shape[2]
                valid = jnp.arange(smax)[None, :] < kv_len[..., None]
                ctx = decode_attention_bhsd(
                    q,
                    dequantize_kv(new_cache["kq"], new_cache["ks"], k.dtype),
                    dequantize_kv(new_cache["vq"], new_cache["vs"], v.dtype),
                    valid,
                )
        else:
            k_cache, v_cache = kv_cache
            # speculative verify windows (1 < s <= 8, bf16 cache, TPU): the
            # k-row in-place append + windowed attention kernels. Without
            # them the verify step paid BOTH a scatter-paired full-cache
            # copy AND an XLA cache read at ~25% of roofline — the reason
            # the r4 spec gauge LOST to greedy (17.03 vs 17.38 rep/s) while
            # committing 2.9 tokens per weight pass. kv_len here is the
            # affine verify contract (write + j + 1, speculate.py:171),
            # which the window kernel derives from write_index.
            use_window = (
                1 < s <= 8
                and kv_len.ndim == 2
                and (attn_impl == "pallas"
                     or (attn_impl == "auto" and jax.default_backend() == "tpu"))
                and os.environ.get("MMMM_SPEC_KERNEL", "1") == "1"
            )
            if (use_pallas or use_window) and os.environ.get("MMMM_KV_APPEND", "1") == "1":
                # in-place append kernel: the vmapped DUS below lowers to a
                # scatter whose result feeding the Pallas read makes XLA copy
                # the whole cache every step (~4.4 ms at B40 — the single
                # largest decode-step term, PROBE_DECODE_r04.jsonl)
                if s == 1:
                    from ...ops.decode_kernel import kv_append_pallas

                    k_cache, v_cache = kv_append_pallas(
                        k_cache, v_cache,
                        jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), write_index,
                    )
                else:
                    from ...ops.decode_kernel import kv_append_pallas_multi

                    k_cache, v_cache = kv_append_pallas_multi(
                        k_cache, v_cache,
                        jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), write_index,
                    )
            else:
                k_cache = upd(k_cache, jnp.swapaxes(k, 1, 2), write_index)
                v_cache = upd(v_cache, jnp.swapaxes(v, 1, 2), write_index)
            ctx = None
            if use_pallas:
                from ...ops.decode_kernel import decode_attention_pallas

                ctx = decode_attention_pallas(q, k_cache, v_cache, kv_len)
            # use_window: the k-row window READ stays on the XLA bhsd path —
            # the round-5 slope probe (ms/layer at B48 H32 S328, relay
            # intercept removed): append+XLA 0.377, append+window-kernel
            # 0.548, window-kernel alone 0.410, greedy step 0.421. XLA reads
            # the in-place-appended cache at ~roofline once the scatter
            # append is gone; composing the Pallas window read with the
            # aliased append carry is what loses. The r4 spec loss was the
            # SCATTER append (copy pairing), not the XLA read itself.
            if ctx is None:  # XLA path, or the window's K+V exceeds VMEM
                smax = k_cache.shape[2]
                valid = jnp.arange(smax)[None, :] < kv_len[..., None]
                ctx = decode_attention_bhsd(q, k_cache, v_cache, valid)
            new_cache = (k_cache, v_cache)
    ctx = ctx.reshape(b, s, c)
    attn_out = dual(ctx, lp["vis_dense"], lp["lang_dense"])
    x = residual + attn_out
    residual = x
    x = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
    x = residual + mlp(x)
    return x, new_cache


def llm_forward(
    params: dict,
    cfg: CogVLMConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, C)
    token_type_ids: jnp.ndarray,  # (B, S)
    position_ids: jnp.ndarray,  # (B, S)
    segments: jnp.ndarray,  # (B, S) attention-mask segments (0 = pad)
    *,
    attn_impl: str = "auto",
    remat: bool = False,
    return_kv: bool = False,
    vis_span: tuple[int, int] | None = None,
):
    """Full-sequence forward; returns final hidden states (B, S, C) after norm.

    With ``return_kv=True`` additionally returns per-layer rotated keys/values
    stacked as {"k": (L, B, S, H, D), "v": ...} for KV-cache prefill.

    ``vis_span=(lo, hi)`` declares that every row's vision-typed tokens are
    exactly [lo, hi) (the single-image serving layout): the layers then use
    static slicing instead of dual masked matmuls — the expert-routing span
    is [lo, hi-1) per the off-by-one rule (a token uses the vision expert iff
    it AND its successor are vision-typed, ``modeling_cogvlm.py:62-64``).
    """
    vis_mask = vision_expert_mask(token_type_ids)
    cos, sin = rope_cos_sin(cfg.max_position_embeddings, cfg.head_dim)
    expert_span = None
    if vis_span is not None:
        lo, hi = vis_span
        expert_span = (lo, hi - 1)
    layer = partial(
        _decoder_layer,
        cfg=cfg,
        vis_mask=vis_mask,
        segments=segments,
        position_ids=position_ids,
        cos=cos,
        sin=sin,
        attn_impl=attn_impl,
        expert_span=expert_span,
    )

    if not return_kv:
        # pipeline-parallel path: the trainer staged the stacked layers over a
        # ``pipe`` mesh axis (parallel/pipeline.set_pipe_context) — run the
        # GPipe microbatch schedule instead of the local scan. KV-returning
        # prefill stays local (serving is TP/single-chip territory).
        from ...parallel.pipeline import get_pipe_context, pipe_ready, pipeline_layers

        ctx = get_pipe_context()
        if ctx is not None and pipe_ready(params["layers"], inputs_embeds.shape[0]):
            mesh, axis, n_micro = ctx

            def layer_fn(h, lp, side):
                h_new, _ = _decoder_layer(
                    h, lp, cfg=cfg, vis_mask=side["vis_mask"],
                    segments=side["segments"], position_ids=side["position_ids"],
                    cos=cos, sin=sin,
                    attn_impl="auto" if attn_impl == "ring" else attn_impl,
                    expert_span=expert_span,
                )
                return h_new

            if remat:
                layer_fn = jax.checkpoint(layer_fn, policy=remat_policy(remat))
            side = {
                "vis_mask": vis_mask,
                "segments": segments,
                "position_ids": position_ids,
            }
            x = pipeline_layers(
                layer_fn, params["layers"], inputs_embeds, side, mesh, axis, n_micro
            )
            return rms_norm(x, params["norm"], cfg.rms_norm_eps)

    def body(h, lp):
        h_new, kv = layer(h, lp)
        return h_new, kv if return_kv else None

    if remat:
        body = jax.checkpoint(body, policy=remat_policy(remat))
    x, kv = jax.lax.scan(body, inputs_embeds, params["layers"])
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if return_kv:
        return x, {"k": kv[0], "v": kv[1]}
    return x


def llm_prefill(
    params: dict,
    cfg: CogVLMConfig,
    inputs_embeds: jnp.ndarray,  # (B, S, C)
    token_type_ids: jnp.ndarray,  # (B, S)
    position_ids: jnp.ndarray,  # (B, S)
    segments: jnp.ndarray,  # (B, S)
    *,
    smax: int,
    attn_impl: str = "auto",
    vis_span: tuple[int, int] | None = None,
    kv_cache_dtype: str = "bf16",
):
    """Full-sequence prefill writing each layer's rotated K/V straight into a
    preallocated (B, H, Smax, D) decode cache.

    ``llm_forward(return_kv=True)`` stacks all layers' K/V as (L, B, S, H, D)
    and the caller then transposes + pad-concats into per-layer caches — three
    full-size HBM transients alive at once, which (with the ViT activation
    peak) set the serving batch ceiling. Unrolling the layer loop — exactly
    like ``llm_decode_step`` — keeps the peak at ONE layer's K/V and lets XLA
    fuse the cache write into the layer computation.

    Returns (hidden (B, S, C) after final norm, per-layer cache list in the
    same format ``llm_decode_step`` consumes: (k, v) bf16 pairs or int8 dicts).
    """
    b, s, _ = inputs_embeds.shape
    h, d = cfg.num_attention_heads, cfg.head_dim
    vis_mask = vision_expert_mask(token_type_ids)
    cos, sin = rope_cos_sin(cfg.max_position_embeddings, cfg.head_dim)
    expert_span = None
    if vis_span is not None:
        lo, hi = vis_span
        expert_span = (lo, hi - 1)
    x = inputs_embeds
    caches = []
    for li in range(cfg.num_hidden_layers):
        lp = jax.tree.map(lambda a: a[li], params["layers"])
        x, (k, v) = _decoder_layer(
            x,
            lp,
            cfg=cfg,
            vis_mask=vis_mask,
            segments=segments,
            position_ids=position_ids,
            cos=cos,
            sin=sin,
            attn_impl=attn_impl,
            expert_span=expert_span,
        )
        k_bhsd = jnp.swapaxes(k, 1, 2)  # (B, H, S, D)
        v_bhsd = jnp.swapaxes(v, 1, 2)
        if kv_cache_dtype == "int8":
            from ...ops.quant import quantize_kv

            kq, ks = quantize_kv(k_bhsd)
            vq, vs = quantize_kv(v_bhsd)
            caches.append({
                "kq": jnp.zeros((b, h, smax, d), jnp.int8).at[:, :, :s].set(kq),
                "ks": jnp.zeros((b, h, smax, 1), jnp.bfloat16).at[:, :, :s].set(ks),
                "vq": jnp.zeros((b, h, smax, d), jnp.int8).at[:, :, :s].set(vq),
                "vs": jnp.zeros((b, h, smax, 1), jnp.bfloat16).at[:, :, :s].set(vs),
            })
        else:
            caches.append((
                jnp.zeros((b, h, smax, d), k.dtype).at[:, :, :s].set(k_bhsd),
                jnp.zeros((b, h, smax, d), v.dtype).at[:, :, :s].set(v_bhsd),
            ))
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, caches


def llm_decode_step(
    params: dict,
    cfg: CogVLMConfig,
    inputs_embeds: jnp.ndarray,  # (B, Sq, C): Sq=1 decode, Sq=k verify window
    token_type_ids: jnp.ndarray | None,  # unused (decode is provably lang-only)
    position_ids: jnp.ndarray,  # (B, Sq)
    kv_caches: list,  # per-layer (k, v) bf16 pairs (B, H, Smax, D) OR int8 dicts {"kq","ks","vq","vs"}
    write_index: jnp.ndarray,  # (B,) first cache slot for this window
    kv_len: jnp.ndarray,  # (B,) valid slots incl. this token; or (B, Sq) per window position
    attn_impl: str = "auto",
):
    """Decode one token — or verify a k-token speculative window — against
    static KV caches; returns (hidden (B, Sq, C), caches).

    The expert mask for a decoded token is provably all-False (its successor
    is always language-typed; drafts are generated tokens too), so the layer
    statically runs the language expert only — halving per-step weight reads
    (``lang_only=True``). A k-token window costs the same weight reads as a
    single-token step — the basis of the speculative-decode speedup
    (``models/speculate.py``); pass ``kv_len[b, j] = write_index[b] + j + 1``
    so window position j is causal within the window.

    ``kv_caches`` is a per-layer list of (k, v) pairs, each (B, H, Smax, D):
    the layer loop is unrolled (not scanned) so every cache update is a
    single aliasable dynamic-update-slice — a stacked scan would copy the
    whole cache into fresh stacked outputs every step.
    """
    cos, sin = rope_cos_sin(cfg.max_position_embeddings, cfg.head_dim)
    x = inputs_embeds

    new_caches = []
    for li, layer_cache in enumerate(kv_caches):
        lp = jax.tree.map(lambda a: a[li], params["layers"])
        x, new_cache = _decoder_layer(
            x,
            lp,
            cfg=cfg,
            vis_mask=None,
            segments=None,
            position_ids=position_ids,
            cos=cos,
            sin=sin,
            attn_impl=attn_impl,
            cache=(layer_cache, write_index, kv_len),
            lang_only=True,
        )
        new_caches.append(new_cache)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_caches
