#!/usr/bin/env python
"""On-chip probes for the decode-attention kernels (run on the real TPU).

CPU interpret mode cannot check Mosaic rules (block shapes, scalar-prefetch
block remaps, scoped-vmem limits), so every new kernel gets a correctness +
timing smoke here before it becomes a serving default.

    python scripts/tpu_probes.py ragged        # length-aware-read kernels
    python scripts/tpu_probes.py longctx       # decode cost vs cache length

Prints one JSON line per (kernel, shape) case. Timing methodology: the kernel
runs ITERS times inside one jitted lax.scan whose carry is the attention
output (serializes iterations, defeats CSE); the axon relay's
block_until_ready does not block, so runs are fenced with a host fetch of a
scalar reduction.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

ITERS = 1000


def _ref_attn(q, k, v, kv_len, scale):
    import jax
    import jax.numpy as jnp

    s = k.shape[2]
    logits = jnp.einsum(
        "bqhd,bhsd->bhqs", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    mask = jnp.arange(s)[None, None, None, :] < kv_len[:, None, None, None]
    p = jax.nn.softmax(jnp.where(mask, logits, -1e30), axis=-1)
    return jnp.einsum("bhqs,bhsd->bqhd", p, v.astype(jnp.float32))


_DISPATCH_OVERHEAD = None


def _dispatch_overhead():
    """Seconds for one dispatch + scalar host fetch through the relay (the
    per-loop fixed cost to subtract from kernel timings)."""
    global _DISPATCH_OVERHEAD
    if _DISPATCH_OVERHEAD is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: jnp.sum(x * 1.0001))
        x = jnp.ones((8, 128), jnp.float32)
        np.asarray(f(x))
        ts = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(f(x))
            ts.append(time.time() - t0)
        _DISPATCH_OVERHEAD = min(ts)
        print(json.dumps({"probe": "dispatch_overhead_ms",
                          "value": round(_DISPATCH_OVERHEAD * 1e3, 2)}), flush=True)
    return _DISPATCH_OVERHEAD


def _time_loop(fn, q0, *operands):
    """Seconds per call of ``fn(q, *operands) -> (B,1,H,D)`` over ITERS
    chained calls inside ONE jitted scan (one dispatch; the carry serializes
    iterations and defeats CSE). ``operands`` (the KV caches) MUST be passed
    explicitly — closing over them turns hundreds of MB into jit constants
    that ship to the remote compile service (HTTP 413 at S=2048). Relay
    dispatch+fetch overhead is measured and subtracted."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(qc, *ops):
        def body(qq, _):
            return fn(qq, *ops).astype(qq.dtype), ()

        qf, _ = lax.scan(body, qc, None, length=ITERS)
        return jnp.sum(qf.astype(jnp.float32))

    over = _dispatch_overhead()
    np.asarray(loop(q0, *operands))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        np.asarray(loop(q0, *operands))
        best = min(best, time.time() - t0)
    return max(best - over, 0.0) / ITERS


def _try_time_ms(fn, q0, *operands):
    """Like _time_loop but returns None when the kernel cannot lower (the
    full-read kernels legitimately exceed VMEM at long S — that IS a result)."""
    try:
        return round(_time_loop(fn, q0, *operands) * 1e3, 3)
    except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
        print(json.dumps({"note": f"kernel failed: {str(e)[:200]}"}), flush=True)
        return None


def probe_ragged(out):
    import jax.numpy as jnp

    from mmmm_tpu.ops.decode_kernel import (
        _decode_attention_pallas_full,
        _decode_attention_pallas_q8_full,
        _ragged_block,
        decode_attention_pallas_q8_ragged,
        decode_attention_pallas_ragged,
    )
    from mmmm_tpu.ops.quant import quantize_kv

    b, h, d = 24, 32, 128
    rng = np.random.default_rng(0)
    for smax in (320, 2048):
        bs = _ragged_block(smax)
        print(json.dumps({"probe": "ragged_decode", "status": "start", "S": smax}),
              flush=True)
        q = jnp.asarray(rng.normal(0, 1, (b, 1, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 1, (b, h, smax, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (b, h, smax, d)), jnp.bfloat16)
        # serving-like raggedness: mixed lengths incl. one full and one short
        kv_len = jnp.asarray(
            np.r_[smax, max(1, smax // 8), rng.integers(smax // 3, smax + 1, b - 2)],
            jnp.int32,
        )
        scale = d**-0.5
        ref = np.asarray(_ref_attn(q, k, v, kv_len, scale))

        import jax

        got = np.asarray(
            jax.jit(
                functools.partial(
                    decode_attention_pallas_ragged, scale=scale, block_s=bs
                )
            )(q, k, v, kv_len)
        ).astype(np.float32)
        err = float(np.max(np.abs(got - ref)))
        t_full = _try_time_ms(
            lambda qq, kk, vv, kl: _decode_attention_pallas_full(qq, kk, vv, kl, scale=scale),
            q, k, v, kv_len,
        )
        t_rag = _time_loop(
            lambda qq, kk, vv, kl: decode_attention_pallas_ragged(
                qq, kk, vv, kl, block_s=bs
            ),
            q, k, v, kv_len,
        )

        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        got8 = np.asarray(
            jax.jit(
                functools.partial(
                    decode_attention_pallas_q8_ragged, scale=scale, block_s=bs
                )
            )(q, kq, ks, vq, vs, kv_len)
        ).astype(np.float32)
        err8 = float(np.max(np.abs(got8 - ref)))
        t8_full = _try_time_ms(
            lambda qq, *o: _decode_attention_pallas_q8_full(qq, *o, scale=scale),
            q, kq, ks, vq, vs, kv_len,
        )
        t8_rag = _time_loop(
            lambda qq, *o: decode_attention_pallas_q8_ragged(qq, *o, block_s=bs),
            q, kq, ks, vq, vs, kv_len,
        )
        rec = {
            "probe": "ragged_decode",
            "B": b, "H": h, "S": smax, "D": d, "block_s": bs,
            "max_abs_err_bf16": round(err, 4),
            "max_abs_err_q8": round(err8, 4),
            "ms_full_bf16": t_full,
            "ms_ragged_bf16": round(t_rag * 1e3, 3),
            "ms_full_q8": t8_full,
            "ms_ragged_q8": round(t8_rag * 1e3, 3),
        }
        print(json.dumps(rec), flush=True)
        out.append(rec)


def probe_longctx(out):
    """Decode-step cost vs cache length for bf16 vs int8-KV, ragged reads on:
    locates the crossover where int8 KV starts paying."""
    import jax.numpy as jnp

    from mmmm_tpu.ops.decode_kernel import (
        _ragged_block,
        decode_attention_pallas_q8_ragged,
        decode_attention_pallas_ragged,
    )
    from mmmm_tpu.ops.quant import quantize_kv

    b, h, d = 16, 32, 128
    hbm_gbps = 819.0  # v5e HBM bandwidth
    rng = np.random.default_rng(1)
    for smax in (512, 1024, 2048, 4096, 8192):
        bs = _ragged_block(smax)
        q = jnp.asarray(rng.normal(0, 1, (b, 1, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 1, (b, h, smax, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (b, h, smax, d)), jnp.bfloat16)
        kv_len = jnp.full((b,), smax, jnp.int32)  # worst case: all slots valid
        t_bf16 = _time_loop(
            lambda qq, kk, vv, kl: decode_attention_pallas_ragged(
                qq, kk, vv, kl, block_s=bs
            ),
            q, k, v, kv_len,
        )
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        t_q8 = _time_loop(
            lambda qq, *o: decode_attention_pallas_q8_ragged(qq, *o, block_s=bs),
            q, kq, ks, vq, vs, kv_len,
        )
        # r04 kernel-variant ladder: the f32-dequant q8 kernel measured
        # 0.28-0.34 bw-util (vs bf16's 0.92) — is the bottleneck the dequant
        # cast width (try bf16 products) or the S-block pipelining (try 256)?
        t_q8_b = _time_loop(
            lambda qq, *o: decode_attention_pallas_q8_ragged(
                qq, *o, block_s=bs, cast="bf16"
            ),
            q, kq, ks, vq, vs, kv_len,
        )
        t_q8_b256 = _time_loop(
            lambda qq, *o: decode_attention_pallas_q8_ragged(
                qq, *o, block_s=256, cast="bf16"
            ),
            q, kq, ks, vq, vs, kv_len,
        ) if smax % 256 == 0 else None
        # bandwidth utilization: the step's compulsory read is the K+V stream
        # (q/out are negligible); the ragged kernel's ceiling is HBM
        bytes_bf16 = 2 * b * h * smax * d * 2
        bytes_q8 = 2 * b * h * smax * (d + 2)  # int8 payload + bf16 scale
        util8 = lambda t: round(bytes_q8 / t / 1e9 / hbm_gbps, 3) if t else None
        rec = {
            "probe": "longctx_decode", "B": b, "S": smax,
            "ms_bf16": round(t_bf16 * 1e3, 3), "ms_q8": round(t_q8 * 1e3, 3),
            "ms_q8_bf16cast": round(t_q8_b * 1e3, 3),
            "ms_q8_bf16cast_blk256": round(t_q8_b256 * 1e3, 3) if t_q8_b256 else None,
            "bw_util_bf16": round(bytes_bf16 / t_bf16 / 1e9 / hbm_gbps, 3),
            "bw_util_q8": util8(t_q8),
            "bw_util_q8_bf16cast": util8(t_q8_b),
            "bw_util_q8_bf16cast_blk256": util8(t_q8_b256),
        }
        print(json.dumps(rec), flush=True)
        out.append(rec)


def probe_qdot(out):
    """Decode-step matmul bandwidth: is the W8A16 qdot (``x @ q.astype(bf16)
    * s``) reading the int8 bytes at roofline, or does XLA materialize the
    dequantized bf16 weight at decode M (which would triple effective weight
    traffic and explain the gen-program gap: measured ~11 ms/decode step at
    B28 vs ~6.5 ms analytic)?

    Times each decode-shape weight in a jitted scan (weights as explicit
    operands, carry defeats CSE), for three weight-read strategies:
      int8 = W8A16 qdot (``x @ q.astype(bf16) * s`` — dequant retile on VPU)
      bf16 = plain dense matmul (2x the bytes, no retile)
      w8a8 = dynamic per-row activation int8 + NATIVE int8xint8 MXU matmul
             with int32 accum (no dequant retile on the weight read at all)
    and reports achieved GB/s against the 819 GB/s HBM roofline.

    Probe-validity note (first run got this wrong): the feedback that
    restores the carry shape must CONSUME every output column — a plain
    ``y[:, :k]`` slice lets XLA dead-code-eliminate the unused weight
    columns (the N=32008 'bf16' row measured 9.3 TB/s: it was reading 1/8th
    of the weight). The reduction over the tail keeps all columns live."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mmmm_tpu.ops.quant import qdot, quantize_int8

    m = int(__import__("os").environ.get("MMMM_PROBE_M", "28"))
    rng = np.random.default_rng(0)
    shapes = {
        "qkvo_4096x4096": (4096, 4096),
        "mlp_up_4096x11008": (4096, 11008),
        "mlp_down_11008x4096": (11008, 4096),
        "head_4096x32008": (4096, 32008),
    }
    iters = 1000
    for name, (k, n) in shapes.items():
        w = jnp.asarray(rng.normal(0, 0.02, (k, n)), jnp.bfloat16)
        wq = quantize_int8(w)
        x0 = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)

        def feedback(y):
            # consume EVERY column (DCE guard), restore (m, k) carry
            if y.shape[1] > k:
                tail = jnp.sum(y[:, k:], axis=1, keepdims=True)
                xn = y[:, :k] + tail.astype(y.dtype)
            elif y.shape[1] < k:
                xn = jnp.pad(y, ((0, 0), (0, k - y.shape[1])))
            else:
                xn = y
            return (xn * 1e-3).astype(jnp.bfloat16)

        def run8(x, q, s):
            def body(c, _):
                return feedback(qdot(c, {"q": q, "s": s})), ()
            return lax.scan(body, x, None, length=iters)[0]

        def runb(x, wf):
            def body(c, _):
                return feedback(jnp.dot(c, wf)), ()
            return lax.scan(body, x, None, length=iters)[0]

        def run_a8(x, q, s):
            def body(c, _):
                # dynamic per-row activation quantization (decode M is tiny:
                # the quant cost is m*k elementwise vs k*n weight reads)
                amax = jnp.max(jnp.abs(c), axis=1, keepdims=True)
                sx = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
                xq = jnp.round(c.astype(jnp.float32) / sx).astype(jnp.int8)
                y32 = lax.dot_general(
                    xq, q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = (y32.astype(jnp.float32) * sx * s).astype(jnp.bfloat16)
                return feedback(y), ()
            return lax.scan(body, x, None, length=iters)[0]

        def timed(jfn, *args):
            np.asarray(jnp.sum(jfn(*args).astype(jnp.float32)))  # compile
            t0 = time.time()
            np.asarray(jnp.sum(jfn(*args).astype(jnp.float32)))
            return (time.time() - t0 - _dispatch_overhead()) / iters

        t8 = timed(jax.jit(run8), x0, wq["q"], wq["s"])
        tb = timed(jax.jit(runb), x0, w)
        ta8 = timed(jax.jit(run_a8), x0, wq["q"], wq["s"])
        rec = {
            "probe": "qdot_decode", "M": m, "K": k, "N": n,
            "ms_int8": round(t8 * 1e3, 4), "ms_bf16": round(tb * 1e3, 4),
            "ms_w8a8": round(ta8 * 1e3, 4),
            "util_int8": round(k * n / t8 / 1e9 / 819.0, 3),
            "util_bf16": round(2 * k * n / tb / 1e9 / 819.0, 3),
            "util_w8a8": round(k * n / ta8 / 1e9 / 819.0, 3),
        }
        print(json.dumps(rec), flush=True)
        out.append(rec)


def probe_stages(out, only: str | None = None):
    """Serving wall-clock split at the bench config (B28, W8A16): ViT-only,
    full prefill (ViT + LLM + first logits), SAM grounding stage, and the
    end-to-end loop — so the next optimization targets the actual
    bottleneck, not a guess. Holding several compiled 6.5 B stages at once
    OOMs the 16 GB chip, so run ONE stage per process:

        for s in vit prefill sam end_to_end; do
            python scripts/tpu_probes.py stages --only $s; done
    """
    import jax
    import jax.numpy as jnp

    import bench

    def timed(name, fn, reps=3):
        fn()  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            fn()
        dt = (time.time() - t0) / reps
        rec = {"probe": "serving_stage", "stage": name, "ms": round(dt * 1e3, 1)}
        print(json.dumps(rec), flush=True)
        out.append(rec)
        return dt

    params, cfg, tokenizer = bench.build_params()
    b = bench.BATCH
    # build the full end-to-end program ONLY when measuring it: at B48 the
    # compiled generate program + any second stage together RESOURCE_EXHAUST
    # the chip (queue-N probes: vit/sam died holding both, prefill survived)
    if only in (None, "end_to_end"):
        run, flops = bench.build_run(
            params, cfg, tokenizer, b, bench.MAX_NEW_TOKENS,
            bench.KV_DTYPE, bench.PREFILL_CHUNK,
            # pin greedy: bench's SPEC default flipped to 7 in r5; the stage
            # table decomposes the greedy program (historical comparability)
            spec=0,
        )

    if only in (None, "vit"):
        from mmmm_tpu.models.cogvlm.vit import vit_forward

        image = jnp.ones((b, 3, 32, 384, 384), jnp.bfloat16)

        @jax.jit
        def vit_only(p, im):
            return vit_forward(
                p["cogvlm"]["vision"], cfg.vlm, im, (16, 16, 16), (2, 2, 2)
            )

        timed(
            "vit",
            lambda: np.asarray(jnp.sum(vit_only(params, image).astype(jnp.float32))),
        )

    if only in (None, "prefill"):
        prefill_run = bench.build_prefill(params, cfg, b)
        timed("prefill", prefill_run)

    if only in (None, "sam"):
        from mmmm_tpu.models.inference import _grounding_stage

        hidden = jnp.ones(
            (b, bench.PROMPT_LEN + bench.MAX_NEW_TOKENS, cfg.vlm.hidden_size),
            jnp.bfloat16,
        )
        positions = jnp.zeros((b, 4), jnp.int32)
        # uint8 like the serving path (the stage casts to fp32 in-graph); a
        # resident fp32 copy is 4.8 GB at B48 — the r4 sam-row OOM was this
        # probe artifact, not the serving stage
        g_image = jnp.ones((b, 3, 32, 256, 256), jnp.uint8)
        stage = _grounding_stage(cfg, (16, 16, 16), False, "auto")
        timed(
            "sam",
            lambda: np.asarray(
                jnp.sum(stage(params, hidden, positions, g_image).astype(jnp.float32))
            ),
        )

    if only in (None, "end_to_end"):
        timed("end_to_end", run)


def probe_prefill_bisect(out):
    """Attribute the prefill wall clock (1256 ms at B48 = 46% of the serving
    batch, PROBE_STAGES_r04n) by timing ``bench.build_prefill``'s program
    with one component ablated per variant. Ablations are trace-time
    monkeypatches of the names build_prefill resolves via its call-time
    imports; every replacement keeps a data dependency on the real inputs so
    XLA cannot DCE the surviving components.

      full        unmodified prefill (ViT + LLM + first logits)
      nogelu      ViT gelu -> identity (fitted-poly VPU cost, 24 fc1 passes)
      novitattn   ViT segment_attention -> q passthrough (D=88 dense kernel)
      nopatch     variable-z patch embed -> broadcast (im2col conv cost)
      novit       whole ViT -> broadcast (leaves LLM + head + embed)
      nollmattn   LLM segment_attention -> q passthrough (S=192 causal flash)
      nollm       whole llm_forward -> broadcast (leaves ViT + head)

    Component cost = ms(full) - ms(variant); overlapping savings mean parts
    need not sum to the total. Analytic matmul floor at B48: ViT ~384 ms,
    LLM ~267 ms (bench._matmul_flops / 197 TFLOP/s)."""
    import os

    import jax.numpy as jnp

    import bench
    from mmmm_tpu.models.cogvlm import decoder as dec_mod
    from mmmm_tpu.models.cogvlm import vit as vit_mod

    b = int(os.environ.get("MMMM_PROBE_B", str(bench.BATCH)))
    params, cfg, _ = bench.build_params()
    h_llm = cfg.vlm.hidden_size

    def keepdep_attn(q, k, v, seg, **kw):
        # passthrough that still consumes k/v so the fused qkv matmul is not
        # narrowed to its q third at compile time
        dep = (jnp.sum(k, axis=-1, keepdims=True)
               + jnp.sum(v, axis=-1, keepdims=True)).astype(jnp.float32)
        return (q.astype(jnp.float32) + dep * 1e-30).astype(q.dtype)

    def cheap_patch(im, w, bias, patch_size):
        gd, gh, gw = (im.shape[2] // patch_size[0], im.shape[3] // patch_size[1],
                      im.shape[4] // patch_size[2])
        dep = (jnp.sum(im.astype(jnp.float32)) * 1e-12
               + jnp.sum(w.astype(jnp.float32)) * 1e-12)
        return jnp.full((im.shape[0], w.shape[0], gd, gh, gw), 0.01,
                        jnp.bfloat16) + dep.astype(jnp.bfloat16)

    def cheap_vit(p, c, im, patch_size, pool_size, **kw):
        dep = jnp.sum(im.astype(jnp.float32)) * 1e-12
        return jnp.full((im.shape[0], bench.N_VIS, h_llm), 0.01,
                        jnp.bfloat16) + dep.astype(jnp.bfloat16)

    def cheap_llm(p, c, emb, *a, **kw):
        dep = jnp.sum(emb.astype(jnp.float32), axis=-1, keepdims=True)
        return jnp.broadcast_to(dep * 1e-3, emb.shape).astype(emb.dtype)

    variants = [
        ("full", []),
        ("nogelu", [(vit_mod, "_gelu", lambda x: x)]),
        ("novitattn", [(vit_mod, "segment_attention", keepdep_attn)]),
        ("nopatch", [(vit_mod, "variable_patch_embed_3d", cheap_patch)]),
        ("novit", [(vit_mod, "vit_forward", cheap_vit)]),
        ("nollmattn", [(dec_mod, "segment_attention", keepdep_attn)]),
        ("nollm", [(dec_mod, "llm_forward", cheap_llm)]),
    ]
    only = os.environ.get("MMMM_PROBE_VARIANT")
    for name, patches in variants:
        if only and name != only:
            continue
        saved = [(mod, attr, getattr(mod, attr)) for mod, attr, _ in patches]
        for mod, attr, repl in patches:
            setattr(mod, attr, repl)
        try:
            # build_prefill imports vit_forward/llm_forward at call time, so
            # the patches above are what its jitted program traces
            run = bench.build_prefill(params, cfg, b)
            run()  # compile + warm
        finally:
            for mod, attr, orig in saved:
                setattr(mod, attr, orig)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        rec = {"probe": "prefill_bisect", "variant": name, "batch": b,
               "ms": round(best * 1e3, 1)}
        print(json.dumps(rec), flush=True)
        out.append(rec)
        run = None  # release the row's device inputs before the next build


def probe_vitattn(out):
    """Attribute the ViT attention term (prefill bisect r05: novitattn saves
    ~283 ms of the 1264 ms B48 prefill, vs a ~80 ms matmul ceiling at D=88).
    Three timings at the ViT shape (B from MMMM_PROBE_B, H=16, S=1153, D=88),
    each a LAYERS-deep jitted scan:

      kernel   dense_attention on inputs ALREADY in (B, H, Spad, D) — pads
               and transposes hoisted out of the loop, so this is the pure
               pallas cost;
      layout   the full segment_attention path from the layer's natural
               (B, S, H, D) — swapaxes + pad + kernel + unpad + swapback;
      padded   the same full path with head_dim zero-padded 88 -> 128
               (pad_attention_heads' runtime effect) — aligned lanes vs
               +45% flops.

    layout - kernel = the transpose/pad tax; if it dominates, the fix is a
    layout-native kernel (or head padding if `padded` wins)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from mmmm_tpu.ops import segment_attention
    from mmmm_tpu.ops.dense_attn import dense_attention

    b = int(os.environ.get("MMMM_PROBE_B", "12"))
    h, s, d = 16, 1153, 88
    layers = 6
    scale = d ** -0.5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (b, s, h, d)), jnp.bfloat16)
    seg = jnp.ones((b, s), jnp.int32)

    def timed(name, jfn, *args, flops):
        try:
            np.asarray(jnp.sum(jfn(*args).astype(jnp.float32)))  # compile + warm
        except Exception as e:  # noqa: BLE001 — a case that cannot lower IS a result
            rec = {"probe": "vitattn", "case": name, "batch": b,
                   "error": f"{type(e).__name__}: {str(e)[:160]}"}
            print(json.dumps(rec), flush=True)
            out.append(rec)
            return
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(jnp.sum(jfn(*args).astype(jnp.float32)))
            best = min(best, time.time() - t0)
        per = best / layers
        rec = {"probe": "vitattn", "case": name, "batch": b,
               "ms_per_layer": round(per * 1e3, 2),
               "mfu": round(flops / per / 197e12, 3)}
        print(json.dumps(rec), flush=True)
        out.append(rec)

    flops = 4 * b * s * s * (h * d)  # QK + PV matmuls per layer (true dims)

    s_pad = -(-s // 128) * 128
    qt = jnp.pad(jnp.swapaxes(q, 1, 2), ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))

    @jax.jit
    def run_kernel_bhsd(qt):
        from mmmm_tpu.ops.dense_attn import _dense_fwd_bhsd

        def body(c, _):
            return _dense_fwd_bhsd(c, c, c, scale, s_real=s), ()
        return lax.scan(body, qt, None, length=layers)[0]

    @jax.jit
    def run_layout(q):
        def body(c, _):
            return segment_attention(c, c, c, seg, impl="auto", scale=scale,
                                     all_valid=True), ()
        return lax.scan(body, q, None, length=layers)[0]

    timed("kernel_bhsd", run_kernel_bhsd, qt, flops=flops)
    timed("layout_full", run_layout, q, flops=flops)

    from mmmm_tpu.ops import dense_attn as da

    @jax.jit
    def run_bshd(q):
        def body(c, _):
            return da._dense_fwd_bshd(c, c, c, scale), ()
        return lax.scan(body, q, None, length=layers)[0]

    timed("bshd_native", run_bshd, q, flops=flops)

    # fast softmax (bf16 exp + post-matmul normalization) on both layouts —
    # the probe's kernel MFU (~8%) implies the softmax VPU chain, not the
    # matmuls, dominates; these rows measure the recovered fraction
    os.environ["MMMM_DENSE_FAST_SOFTMAX"] = "1"
    try:
        @jax.jit
        def run_kernel_fast(qt):
            def body(c, _):
                return da._dense_fwd_bhsd(c, c, c, scale, s_real=s), ()
            return lax.scan(body, qt, None, length=layers)[0]

        timed("kernel_bhsd_fastsm", run_kernel_fast, qt, flops=flops)

        @jax.jit
        def run_bshd_fast(q):
            def body(c, _):
                return da._dense_fwd_bshd(c, c, c, scale), ()
            return lax.scan(body, q, None, length=layers)[0]

        timed("bshd_fastsm", run_bshd_fast, q, flops=flops)
    finally:
        os.environ.pop("MMMM_DENSE_FAST_SOFTMAX", None)

    # matmul floor: same kernel with softmax replaced by a cheap rescale
    # (keeps both MXU dots + mask live) — the attention cost that would
    # remain if softmax were free
    import functools as _ft

    from jax.experimental import pallas as _pl
    from jax.experimental.pallas import tpu as _pltpu

    def _kernel_nosm(q_ref, k_ref, v_ref, o_ref, *, scale, s_real):
        import jax.numpy as _jnp
        from jax import lax as _lax

        qq = q_ref[0, 0]
        kk = k_ref[0, 0]
        vv = v_ref[0, 0]
        st = scale * _lax.dot_general(
            qq, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=_jnp.float32)
        sp = kk.shape[0]
        kpos = _lax.broadcasted_iota(_jnp.int32, (1, sp), 1)
        st = _jnp.where(kpos < s_real, st, 0.0)
        p = st * 1e-4  # stand-in for softmax: one multiply
        o_ref[0, 0] = _lax.dot(
            p.astype(vv.dtype), vv, preferred_element_type=_jnp.float32
        ).astype(o_ref.dtype)

    def nosm_fwd(qt):
        bq = da._pick_bq(s_pad, d)
        return _pl.pallas_call(
            _ft.partial(_kernel_nosm, scale=scale, s_real=s),
            grid=(b, h, s_pad // bq),
            in_specs=[
                _pl.BlockSpec((1, 1, bq, d), lambda bi, hi, i: (bi, hi, i, 0)),
                _pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, i: (bi, hi, 0, 0)),
                _pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, i: (bi, hi, 0, 0)),
            ],
            out_specs=_pl.BlockSpec((1, 1, bq, d), lambda bi, hi, i: (bi, hi, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), jnp.bfloat16),
            compiler_params=_pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
        )(qt, qt, qt)

    @jax.jit
    def run_nosm(qt):
        def body(c, _):
            return nosm_fwd(c), ()
        return lax.scan(body, qt, None, length=layers)[0]

    timed("kernel_nosoftmax", run_nosm, qt, flops=flops)

    d_pad = 128
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))

    @jax.jit
    def run_padded(qp):
        def body(c, _):
            return segment_attention(c, c, c, seg, impl="auto", scale=scale,
                                     all_valid=True), ()
        return lax.scan(body, qp, None, length=layers)[0]

    timed("padded_d128", run_padded, qp, flops=flops)


def probe_train_bisect(out):
    """Attribute the 1.4b train step (r4 gauge: 839 ms, MFU 0.24 at B8
    S1024 remat=attn — four rounds of serving bisects, zero for training;
    VERDICT r4 weak #3). Trace-time monkeypatch ablations with data deps
    kept (one variant per process via MMMM_PROBE_VARIANT):

      full       unmodified LoRA train step (the gauge program)
      novit      ViT fwd+bwd -> broadcast (patch via models/cogvlm/model.py,
                 which binds vit_forward at module level)
      noattn     ALL segment_attention (LLM flash fwd + custom-VJP bwd, ViT
                 dense) -> q passthrough
      nollmattn  LLM segment_attention only
      noce       fused blockwise CE (32k-vocab logits + logsumexp, fwd+bwd)
                 -> cheap reduction

    Component cost = ms(full) - ms(variant); overlaps mean parts need not
    sum to the total."""
    import jax
    import jax.numpy as jnp

    from mmmm_tpu.models import MMMMConfig, MMMMModel
    from mmmm_tpu.models import mmmm as mmmm_mod
    from mmmm_tpu.models.cogvlm import VisionConfig, CogVLMConfig
    from mmmm_tpu.models.cogvlm import decoder as dec_mod
    from mmmm_tpu.models.cogvlm import model as cvm_mod
    from mmmm_tpu.models.cogvlm import vit as vit_mod
    from mmmm_tpu.models.segvol import SamConfig
    from mmmm_tpu.peft import LoraConfig
    from mmmm_tpu.train import (
        OptimizerConfig, init_train_state, make_optimizer, make_train_step,
    )

    cfg = MMMMConfig(
        vlm=CogVLMConfig(
            vocab_size=32008, hidden_size=2048, intermediate_size=5504,
            num_hidden_layers=12, num_attention_heads=16,
            vision=VisionConfig(
                hidden_size=1024, intermediate_size=4096, num_hidden_layers=12,
                num_heads=16, patch_size=(16, 16, 16), pos_embed_shape=(8, 32, 32),
            ),
        ),
        sam=SamConfig(),
    )
    b, s, nv = 8, 1024, 146
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, 32000, size=(b, s)), jnp.int32),
        "token_type_ids": jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + nv].set(1),
        "position_ids": jnp.broadcast_to(jnp.arange(s), (b, s)).astype(jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.full((b, s), -100, jnp.int32).at[:, nv + 2 :].set(7),
        "weight": jnp.ones((b, s), jnp.float32),
        "image": jnp.ones((b, 3, 16, 384, 384), jnp.float32),
        "patch_size": (16, 16, 16),
        "pool_size": (1, 2, 2),
    }
    h_llm = cfg.vlm.hidden_size

    def keepdep_attn(q, k, v, seg, **kw):
        dep = (jnp.sum(k, axis=-1, keepdims=True)
               + jnp.sum(v, axis=-1, keepdims=True)).astype(jnp.float32)
        return (q.astype(jnp.float32) + dep * 1e-30).astype(q.dtype)

    def cheap_vit(p, c, im, patch_size, pool_size, **kw):
        dep = jnp.sum(im.astype(jnp.float32)) * 1e-12
        leaves = jax.tree_util.tree_leaves(p)
        dep = dep + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-12
        return jnp.full((im.shape[0], nv, h_llm), 0.01,
                        jnp.bfloat16) + dep.astype(jnp.bfloat16)

    def cheap_ce(hidden, head, labels, weight=None):
        dep = jnp.sum(hidden.astype(jnp.float32)) * 1e-9
        return dep + jnp.sum(head.astype(jnp.float32)) * 1e-12

    variants = {
        "full": [],
        "novit": [(cvm_mod, "vit_forward", cheap_vit)],
        "noattn": [(dec_mod, "segment_attention", keepdep_attn),
                   (vit_mod, "segment_attention", keepdep_attn)],
        "nollmattn": [(dec_mod, "segment_attention", keepdep_attn)],
        "noce": [(mmmm_mod, "fused_weighted_ce_loss", cheap_ce)],
    }
    only = os.environ.get("MMMM_PROBE_VARIANT")
    for name, patches in variants.items():
        if only and name != only:
            continue
        saved = [(mod, attr, getattr(mod, attr)) for mod, attr, _ in patches]
        for mod, attr, repl in patches:
            setattr(mod, attr, repl)
        try:
            model = MMMMModel(cfg)
            opt = make_optimizer(OptimizerConfig(lr=5e-5, warmup_steps=10,
                                                 max_steps=1000))
            lcfg = LoraConfig(r=64, alpha=8)
            state, frozen = init_train_state(
                jax.random.PRNGKey(0), model, opt, lcfg, frozen_vlm_bf16=True
            )
            span = ("auto" if os.environ.get("MMMM_TRAIN_SPAN", "1") == "1"
                    else None)
            step = make_train_step(model, opt, lcfg, vg_mode="none",
                                   bf16_vlm=True, attn_impl="auto",
                                   remat="attn", vis_span=span)
            state, logs = step(state, frozen, batch)  # compile + warm
            np.asarray(jnp.sum(logs.get("loss", logs["lm_loss"])))
            t0 = time.time()
            for _ in range(3):
                state, logs = step(state, frozen, batch)
            np.asarray(jnp.sum(logs.get("loss", logs["lm_loss"])))
            dt = (time.time() - t0) / 3
        finally:
            for mod, attr, orig in saved:
                setattr(mod, attr, orig)
        rec = {"probe": "train_bisect", "variant": name, "batch": b, "seq": s,
               "ms": round(dt * 1e3, 1)}
        print(json.dumps(rec), flush=True)
        out.append(rec)
        state = frozen = step = None  # release before the next variant


def probe_decode_bisect(out):
    """Attribute the decode-step wall clock (measured ~11 ms vs ~6.5 ms
    analytic at the serving config) by timing the REAL greedy decode scan
    (``generate.greedy_decode_from_state`` — prefill excluded: the state is
    built once, unpatched, and reused) with one component ablated per
    variant. Ablations are trace-time monkeypatches of the module-level
    names the decoder resolves when jit traces the scan, each preserving
    data dependencies (a reduction/broadcast of the real input) so XLA
    cannot dead-code-eliminate the surviving components:

      full       unmodified decode scan (the baseline)
      noattn     cache-read attention -> pass-through q (skips K/V reads)
      noupd      cache writes -> identity (skips the per-step scatter)
      noweights  decoder qdot -> row-sum broadcast (skips ALL weight reads)
      nohead     lm_head matmul -> broadcast (argmax + loop logic remain)
      nosmall    rms_norm/rope -> identity (isolates the per-layer VPU ops)

    Component cost = ms(full) - ms(variant); overlaps mean the parts need
    not sum to the total, but the big terms identify where the next kernel
    or fusion effort pays."""
    import os

    import jax
    import jax.numpy as jnp

    import bench
    from mmmm_tpu.models import generate as gen_mod
    from mmmm_tpu.models.cogvlm import decoder as dec_mod
    from mmmm_tpu.ops import decode_kernel as dk_mod

    b = int(os.environ.get("MMMM_PROBE_B", str(bench.BATCH)))
    new_tokens = int(os.environ.get("MMMM_PROBE_NEWTOK", "128"))
    params, cfg, tokenizer = bench.build_params()
    s = bench.PROMPT_LEN
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 32000, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32)  # text-only: no ViT compile in the loop
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s)).astype(jnp.int32)
    plen = jnp.full((b,), s, jnp.int32)

    state0, hidden, last_hidden = jax.jit(
        lambda p, i, t, po, pl: gen_mod.prefill_decode_state(
            p["cogvlm"], cfg.vlm, i, t, po, pl, smax=s + new_tokens,
            eos_token_id=tokenizer.eos_token_id,
        )
    )(params, ids, tt, pos, plen)
    np.asarray(state0["tok"])  # fence prefill before any timing

    def cheap_dot(x, w, **kw):
        n = (w["q"] if isinstance(w, dict) else w).shape[-1]
        dep = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)
        return jnp.broadcast_to(dep, x.shape[:-1] + (n,)).astype(x.dtype)

    def run_variant(name, patches):
        saved = [(mod, attr, getattr(mod, attr)) for mod, attr, _ in patches]
        for mod, attr, repl in patches:
            setattr(mod, attr, repl)
        try:
            # hidden/last_hidden are ARGUMENTS, not closure captures: a
            # closed-over device array becomes a jit constant shipped to the
            # remote compile service (63 MB at B40 through a ~10 MB/s relay)
            decode = jax.jit(
                lambda p, st, hd, lh: gen_mod.greedy_decode_from_state(
                    p["cogvlm"], cfg.vlm, st, hd, lh,
                    max_new_tokens=new_tokens,
                    eos_token_id=tokenizer.eos_token_id,
                    bop_token_id=tokenizer.bop_token_id,
                    eop_token_id=tokenizer.eop_token_id,
                ).tokens  # GenerateResult is not a pytree; return the array
            )
            np.asarray(jnp.sum(
                decode(params, state0, hidden, last_hidden)))  # compile
        finally:
            for mod, attr, orig in saved:
                setattr(mod, attr, orig)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(jnp.sum(
                decode(params, state0, hidden, last_hidden)))
            best = min(best, time.time() - t0)
        rec = {"probe": "decode_bisect", "variant": name, "batch": b,
               "new_tokens": new_tokens, "ms_total": round(best * 1e3, 1),
               "ms_per_step": round(best * 1e3 / new_tokens, 3)}
        print(json.dumps(rec), flush=True)
        out.append(rec)
        del decode

    run_variant("full", [])
    run_variant("noattn", [
        (dk_mod, "decode_attention_pallas", lambda q, k, v, kl: q),
        (dec_mod, "decode_attention_bhsd", lambda q, k, v, valid: q),
    ])
    run_variant("noupd", [
        (jax.lax, "dynamic_update_slice_in_dim",
         lambda c, u, i, axis: c),
    ])
    run_variant("noweights", [(dec_mod, "qdot", cheap_dot)])
    run_variant("nohead", [(gen_mod, "qdot", cheap_dot)])
    run_variant("nosmall", [
        (dec_mod, "rms_norm", lambda x, w, eps: x),
        (dec_mod, "apply_rope", lambda q, k, cos, sin, pos: (q, k)),
    ])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("probe", choices=["ragged", "longctx", "stages", "qdot",
                                      "decodebisect", "prefillbisect",
                                      "vitattn", "trainbisect"])
    ap.add_argument("--only", default=None,
                    help="stages probe: measure one stage in this process")
    args = ap.parse_args(argv)
    import bench

    # ride out transient relay outages instead of dying at backend init
    bench._wait_for_backend(float(os.environ.get("MMMM_BENCH_WAIT", "1800")))
    out = []
    if args.probe == "ragged":
        probe_ragged(out)
    elif args.probe == "stages":
        probe_stages(out, only=args.only)
    elif args.probe == "qdot":
        probe_qdot(out)
    elif args.probe == "decodebisect":
        probe_decode_bisect(out)
    elif args.probe == "prefillbisect":
        probe_prefill_bisect(out)
    elif args.probe == "vitattn":
        probe_vitattn(out)
    elif args.probe == "trainbisect":
        probe_train_bisect(out)
    else:
        probe_longctx(out)
    return out


if __name__ == "__main__":
    main()
