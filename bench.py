"""Benchmark: grounded-report generation throughput on one TPU chip.

Measures the north-star metric (BASELINE.md): grounded reports/sec/chip for
the FULL serving path on a 7B-class flagship configuration — W8A16 serving
(int8 expert weights + lm_head, the production-serving default; set
MMMM_BENCH_QUANT=0 for the exact-bf16 parity path) —

  multimodal prefill (EVA ViT over a (32, 384, 384) CT + 144+2 vision tokens)
  -> greedy decode of 128 report tokens (dual-expert CogVLM, real 32k vocab)
  -> host-side grounded-phrase parse (tokenizer + eop positions)
  -> SAM semantic mask pass for the parsed targets

plus two secondary gauges required by BASELINE.md's gates:

  - ``mfu``: model FLOPs utilization against the v5e bf16 peak (197 TFLOP/s),
    from analytic matmul FLOP counts of the exact config;
  - ``input_volumes_per_sec``: the native host pipeline (zstd decode +
    trilinear resize, ``native/mmmm_native.cpp``) measured on synthetic CT
    volumes — "ViT never input-bound" holds while this exceeds the
    reports/sec consumption rate.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.
``vs_baseline`` is relative to BENCH_BASELINE.json. The model-scale jump this
round (1.4B toy -> 7B-class, + grounding pass) is a *metric definition change*;
the baseline file records which definition it belongs to and resets once.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PATH = Path(__file__).parent / "BENCH_BASELINE.json"
METRIC_VERSION = 2  # v2: 7B-class grounded path (round 2); v1: 1.4B lang-only
MAX_NEW_TOKENS = int(os.environ.get("MMMM_BENCH_NEWTOK", "128"))
# B48 chunk-12 with the in-place KV-append kernel and decode-scan unroll=2
# is the r04 measured optimum: 17.38 rep/s (BENCH_SWEEP_r04{l,n}) vs 16.93
# plain b48, 16.60 b44, 13.755 pre-append control; b52 device-OOMs (the
# per-step cache copy the append kernel removed WAS the old B44 wall).
# Ragged decode still loses at serving lengths (16.44); int8 KV at B48–56
# still loses (9.7–9.9 rep/s — the q8 retile holds it at 0.27–0.34 bw-util
# vs bf16's 0.92, PROBE_LONGCTX_r04b). Single-program chunked prefill
# (lax.map sub-batches + full-batch decode scan) replaced the three-program
# design whose per-chunk dispatches and donation hazards ate its gains.
# Override with MMMM_BENCH_BATCH / MMMM_BENCH_PREFILL_CHUNK (0 = fused
# single-program prefill).
BATCH = int(os.environ.get("MMMM_BENCH_BATCH", "48"))
PREFILL_CHUNK = int(os.environ.get("MMMM_BENCH_PREFILL_CHUNK", "12"))
# unroll=2 on the decode scan is worth ~+2.6% at B48 (token-identical; the
# library default stays 1 — this pins the BENCH config only, and the long
# row below resets it to 1 for its 512-step scan)
os.environ.setdefault("MMMM_DECODE_UNROLL", "2")
# Second bench row: long decode at the reference demo length (512 new tokens,
# /root/reference/scripts/demo.py:46), where the KV stream quadruples.
# MMMM_BENCH_LONG=0 skips it; kv defaults to the headline row's. Batch
# defaults to 28: the 704-slot bf16 cache is 4.6 GB there — B40 would put
# ~6.6 GB of cache next to the 8 GB weights and OOM.
LONG_NEW_TOKENS = int(os.environ.get("MMMM_BENCH_LONG", "512") or 0)
LONG_BATCH = int(os.environ.get("MMMM_BENCH_LONG_BATCH", "16")) or None
LONG_KV = os.environ.get("MMMM_BENCH_LONG_KV", "")
# the long row defaults to UNCHUNKED prefill: chunked prefill pads the batch
# up to a whole number of chunks (B28 at c12 really ran B36), and the
# lax.map + 512-step-scan program twice hit the remote compiler's memory
# ceiling (HTTP 500, BENCH_SWEEP_r04l.jsonl.log) — B16 single-prefill is
# comfortably inside both walls
LONG_CHUNK = int(os.environ.get("MMMM_BENCH_LONG_CHUNK", "0"))
PROMPT_LEN = 192
N_VIS = 146
V5E_PEAK_BF16 = 197e12
# KV cache dtype: bf16 wins at every measured length (int8's (S, D) VPU
# casts scale with S exactly like the read stream they save — longctx probe:
# q8 ~1.7x slower at S=512..8192); int8 KV is a CAPACITY option only
# (2x context / pool slots per HBM byte).
KV_DTYPE = os.environ.get("MMMM_BENCH_KV", "bf16")  # "bf16" | "int8"
# N-gram speculative decoding draft length (0 = greedy). Token-identical to
# greedy by construction (tests/test_speculative.py + the on-chip gate); the
# DEFAULT since round 5: the in-place multi-append kernel + XLA windowed
# verify read made spec decode WIN on-chip (19.99 vs 17.29 rep/s at B48,
# draft 7, 2.91 tokens/weight-pass on this stream). Acceptance caveat: the
# random-weight stream's n-gram self-similarity is unrepresentative of real
# reports (could be better or worse; real reports are highly templated) —
# the caveat field travels with the row, and a greedy control row is
# emitted alongside for cross-round comparability.
SPEC = int(os.environ.get("MMMM_BENCH_SPEC", "7"))
# Secondary spec gauge row (VERDICT r3 weak #5), only when the headline is
# greedy: a SPEC_ROW-draft run at the fused batch. MMMM_BENCH_SPEC_ROW=0
# skips it.
SPEC_ROW = int(os.environ.get("MMMM_BENCH_SPEC_ROW", "7") or 0)


def _bench_cfg():
    """Largest flagship-shaped config that fits one v5e chip (16 GB) in bf16:
    14 dual-expert layers at hidden 4096 / inter 11008 / 32 heads with the
    real 32k vocab (~5.9 B LLM params; the dual expert makes per-token matmul
    FLOPs equal to a ~12 B dense model), EVA ViT at hidden 1408 x 24 layers
    (~0.6 B), SegVol SAM head. Total ~6.5 B params = ~13 GB bf16, leaving
    room for the KV cache + fp32 logits. (A >=7 B-param dual-expert is >=14 GB
    of weights alone and OOMs with caches — the 17 B flagship runs under TP;
    its sharded lowering + per-device HBM fit are regression-tested in
    tests/test_tp_lowering.py and AOT-checked by dryrun_multichip.)"""
    from mmmm_tpu.models import MMMMConfig
    from mmmm_tpu.models.cogvlm import CogVLMConfig, VisionConfig
    from mmmm_tpu.models.segvol import SamConfig

    return MMMMConfig(
        vlm=CogVLMConfig(
            vocab_size=32008,
            hidden_size=4096,
            intermediate_size=11008,
            num_hidden_layers=14,
            num_attention_heads=32,
            vision=VisionConfig(
                hidden_size=1408,
                intermediate_size=6144,
                num_hidden_layers=24,
                num_heads=16,
                patch_size=(16, 16, 16),
                pos_embed_shape=(8, 32, 32),
            ),
        ),
        sam=SamConfig(),
    )


def _tokenizer():
    from mmmm_tpu.data.tokenizer import SPECIAL_TOKENS, MMMMTokenizer, _ByteBackend

    return MMMMTokenizer(
        _ByteBackend(), {t: 32000 + i for i, t in enumerate(SPECIAL_TOKENS)}
    )


def _matmul_flops(cfg, batch, s_prompt, n_new, n_vis):
    """Analytic matmul FLOPs (2*m*n*k per matmul); returns
    (prefill_flops, decode_flops) so the two stages gauge separately."""
    v = cfg.vlm
    h, i, L = v.hidden_size, v.intermediate_size, v.num_hidden_layers
    vi = v.vision
    # ViT over the pre-pool token grid (2 z-slices x 24 x 24 + cls)
    t_vit = 2 * 24 * 24 + 1
    vit_per_tok = 8 * vi.hidden_size ** 2 + 4 * vi.hidden_size * vi.intermediate_size
    vit_attn = 4 * t_vit * vi.hidden_size
    vit = vi.num_hidden_layers * t_vit * (vit_per_tok + vit_attn)
    # expert routing is single-matmul everywhere: prefill uses static-span
    # slicing (each token through exactly one expert) and decode is
    # statically language-only, so per-token weight FLOPs are a single dense
    # layer of this shape
    llm_per_tok = 8 * h * h + 6 * h * i
    prefill_attn = 4 * s_prompt * h  # per token, summed over kv len ~ s/2 avg*2
    prefill = L * s_prompt * (llm_per_tok + prefill_attn)
    s_total = s_prompt + n_new
    decode = L * n_new * (llm_per_tok + 4 * s_total * h)
    head_prefill = 2 * h * v.vocab_size
    head_decode = 2 * h * v.vocab_size * n_new
    return (
        batch * (vit + prefill + head_prefill),
        batch * (decode + head_decode),
    )


def build_prefill(params, cfg, batch):
    """Jitted prefill-only stage (ViT + LLM forward + first-token logits) for
    the prefill-MFU gauge (ROADMAP: prefill is the largest non-fundamental
    serving cost; measure it in isolation). Runs at the prefill-chunk batch
    when chunking is on — that is the program the serving path executes."""
    from mmmm_tpu.models.cogvlm.decoder import llm_forward
    from mmmm_tpu.models.cogvlm.model import splice_vision_embeds
    from mmmm_tpu.models.cogvlm.vit import vit_forward
    from mmmm_tpu.ops.quant import qdot

    b, s = batch, PROMPT_LEN
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 32000, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + N_VIS].set(1)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s)).astype(jnp.int32)
    seg = jnp.ones((b, s), jnp.int32)
    image = jnp.ones((b, 3, 32, 384, 384), jnp.bfloat16)

    @jax.jit
    def prefill(p):
        emb = p["cogvlm"]["llm"]["embed_tokens"][ids]
        vis = vit_forward(p["cogvlm"]["vision"], cfg.vlm, image, (16, 16, 16), (2, 2, 2))
        emb = splice_vision_embeds(emb, vis)
        hidden = llm_forward(
            p["cogvlm"]["llm"], cfg.vlm, emb, tt, pos, seg, vis_span=(1, 1 + N_VIS)
        )
        logits = qdot(hidden[:, -1], p["cogvlm"]["llm"]["lm_head"]).astype(jnp.float32)
        return jnp.sum(logits), jnp.sum(hidden.astype(jnp.float32))

    def run():
        np.asarray(prefill(params)[0])

    return run


def build_params():
    from mmmm_tpu.models import MMMMModel

    cfg = _bench_cfg()
    model = MMMMModel(cfg)
    params = model.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    tokenizer = _tokenizer()
    # bias the <p>/</p> head columns so the random model actually emits tag
    # pairs: the host-side grounded-phrase parse (tokenizer.parse_targets +
    # eop-position gather) then does real work inside the timed loop instead
    # of scanning tag-free sequences (VERDICT r2 weak #4)
    # logit std here is ~0.02*sqrt(hidden) ~= 1.3; a ~3-sigma boost makes the
    # tag tokens win a few percent of argmax draws without dominating
    head = params["cogvlm"]["llm"]["lm_head"]
    bias = jnp.zeros((head.shape[-1],), head.dtype)
    bias = bias.at[tokenizer.bop_token_id].set(3.8).at[tokenizer.eop_token_id].set(3.6)
    params["cogvlm"]["llm"]["lm_head"] = head + bias[None, :]
    quant = os.environ.get("MMMM_BENCH_QUANT", "1")
    if quant != "0":
        # W8A16 serving mode: LLM expert weights + lm_head stream as int8
        # (decode is HBM-bound, so bytes/weight is the throughput ceiling).
        # MMMM_BENCH_QUANT=4: W4A16 experts via the fused Pallas w4_matmul
        # (quarter the weight reads; lm_head stays int8).
        from mmmm_tpu.ops.quant import quantize_llm_for_serving

        params = dict(params)
        params["cogvlm"] = quantize_llm_for_serving(
            params["cogvlm"], bits=4 if quant == "4" else 8
        )
    if os.environ.get("MMMM_BENCH_VIT_PAD", "0") != "0":
        # lossless zero-padding of EVA heads 88 -> 128 lanes: aligns both
        # attention matmuls to the MXU and enables the flash kernel for the
        # ViT (A/B flag; see vit.pad_attention_heads)
        from mmmm_tpu.models.cogvlm.vit import pad_attention_heads

        params = dict(params)
        params["cogvlm"] = dict(params["cogvlm"])
        params["cogvlm"]["vision"] = pad_attention_heads(
            params["cogvlm"]["vision"], cfg.vlm.vision.num_heads
        )
    return params, cfg, tokenizer


def build_run(params, cfg, tokenizer, batch, new_tokens, kv_dtype, chunk,
              spec: int | None = None):
    from mmmm_tpu.models.inference import generate_grounded

    b, s = batch, PROMPT_LEN
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 32000, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + N_VIS].set(1)
    pos = jnp.concatenate(
        [jnp.asarray([[0, 1]]), jnp.full((1, N_VIS - 2), 2), jnp.asarray([[3, 4]]),
         5 + jnp.arange(s - N_VIS - 2)[None]], axis=1,
    ).astype(jnp.int32)
    pos = jnp.broadcast_to(pos, (b, s))
    image = jnp.ones((b, 3, 32, 384, 384), jnp.bfloat16)
    # SegVol encoder is 3-channel (1-channel pretrain inflated, ref
    # image_encoder.py:88-94); grounding images replicate the CT channel.
    # Held uint8 — the PROCESSED ON-DISK FORMAT (images.pt.zst is uint8,
    # preprocess/_base quantization): at B48 a full-batch fp32 copy is 4.8 GB
    # of HBM for an input the SAM stage casts to fp32 in-graph anyway
    # (_grounding_stage); the fp32-policy compute is unchanged, only the
    # resident storage narrows 4x. MMMM_BENCH_GIMG overrides the dtype.
    grounding_image = jnp.ones(
        (b, 3, 32, 256, 256),
        dict(uint8=jnp.uint8, bf16=jnp.bfloat16, fp32=jnp.float32)[
            os.environ.get("MMMM_BENCH_GIMG", "uint8")],
    )
    prompt_len = jnp.full((b,), s, jnp.int32)

    def run():
        res = generate_grounded(
            params, cfg, tokenizer, ids, tt, pos, prompt_len,
            image, (16, 16, 16), (2, 2, 2),
            max_new_tokens=new_tokens, max_targets=4,
            grounding_image=grounding_image, fetch_grounding=False,
            # random weights never emit </p>; force the SAM pass so every
            # report is actually grounded (the metric's definition)
            force_grounding=True,
            # single-image layout: vision-typed tokens are exactly [1, 147),
            # so prefill uses static-span expert routing (half the FLOPs)
            vis_span=(1, 1 + N_VIS),
            # int8 KV cache: decode is HBM-bound; per-slot-quantized caches
            # halve the dominant read stream (ops/quant.quantize_kv)
            kv_cache_dtype=kv_dtype,
            spec_draft_len=SPEC if spec is None else spec,
            # prefill in batch sub-chunks: prefill/SAM transients set the
            # single-chip batch ceiling, not cache bytes (ROADMAP round 3)
            prefill_chunk=chunk,
        )
        # fence the mask computation with an on-device scalar reduction: the
        # axon relay fetches at ~10 MB/s, so pulling the full (B, N, D, H, W)
        # masks would time the relay, not the chip
        np.asarray(jnp.sum(res.masks.astype(jnp.float32)))
        return res

    flops = sum(_matmul_flops(cfg, b, s, new_tokens, N_VIS))
    return run, flops


def bench_input_pipeline(n_volumes: int = 16) -> float:
    """Host pipeline volumes/sec: zstd-decode + trilinear-resize synthetic CT
    volumes through the native prefetcher (pure-Python fallback if the .so is
    absent). This is what must outpace the TPU's reports/sec."""
    import tempfile

    from mmmm_tpu.utils import load_pt_zst, save_pt_zst
    from mmmm_tpu.utils import native

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        # smooth CT-like content: real volumes compress ~2x; pure noise would
        # make zstd the bottleneck and misrepresent the pipeline
        z = np.linspace(0, 1, 48)[:, None, None]
        y = np.linspace(0, 1, 420)[None, :, None]
        x = np.linspace(0, 1, 420)[None, None, :]
        base = z * 80 + y * 60 + x * 40
        for k in range(4):
            vol = (base + rng.normal(0, 2, base.shape)).clip(0, 255).astype(np.uint8)[None]
            p = Path(td) / f"vol{k}.pt.zst"
            save_pt_zst(vol, p)
            paths.append(str(p))

        def consume(raw_path) -> np.ndarray:
            vol = load_pt_zst(raw_path)
            if native.is_available():
                return native.resize_trilinear_u8(np.asarray(vol), (32, 384, 384))
            from mmmm_tpu.data.transforms import resize_3d

            return resize_3d(np.asarray(vol, np.float32)[None], (32, 384, 384))[0]

        if native.is_available():
            import io as _io

            import torch

            pf = native.NativePrefetcher(n_threads=2)
            pf.wait(pf.submit(paths[0]))  # warm
            t0 = time.time()
            jobs = [pf.submit(paths[k % len(paths)]) for k in range(n_volumes)]
            for j in jobs:
                raw = pf.wait(j)  # read + zstd decode on the IO threads
                vol = torch.load(_io.BytesIO(raw), weights_only=False).numpy()
                native.resize_trilinear_u8(vol, (32, 384, 384))
            dt = time.time() - t0
            pf.close()
        else:
            consume(paths[0])
            t0 = time.time()
            for k in range(n_volumes):
                consume(paths[k % len(paths)])
            dt = time.time() - t0
    return n_volumes / dt


def _wait_for_backend(max_wait_s: float) -> None:
    """The axon relay has transient outages (backend init raises UNAVAILABLE
    or hangs); retry in a subprocess probe so a flaky window at bench time
    doesn't record a spurious failure. Gives up after ``max_wait_s``."""
    import subprocess
    import sys

    deadline = time.time() + max_wait_s
    last = b""
    while True:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=max(420.0, max_wait_s / 4),
            )
            if probe.returncode == 0:
                return
            last = probe.stderr
        except subprocess.TimeoutExpired:
            last = b"backend init hang (probe timeout)"
        if time.time() > deadline:
            raise RuntimeError(
                f"TPU backend unavailable after {max_wait_s:.0f}s: "
                f"{last.decode()[-500:]}"
            )
        time.sleep(120)


def _gauge_headline() -> dict:
    """Headline row: full grounded path at the default config. Runs in its
    own process (the orchestrator spawns one subprocess per gauge so a row's
    OOM or relay failure cannot starve the others — VERDICT r4 weak #1)."""
    params, cfg, tokenizer = build_params()
    run, flops = build_run(
        params, cfg, tokenizer, BATCH, MAX_NEW_TOKENS, KV_DTYPE, PREFILL_CHUNK
    )
    # compile + warmup; NOTE: on the axon relay backend block_until_ready does
    # not actually block — generate_grounded ends in host fetches of the token
    # and mask outputs, which fence execution.
    run()
    n_iters = 3
    t0 = time.time()
    for _ in range(n_iters - 1):
        run()
    res = run()
    dt = (time.time() - t0) / n_iters
    row = {
        "value": round(BATCH / dt, 3),
        # useful-work MFU: flops counts the tokens actually produced (spec
        # decode executes more — rejected draft rows — for the same output)
        "mfu": round(flops / dt / V5E_PEAK_BF16, 4),
    }
    if SPEC and getattr(res, "spec_stats", None):
        st = jax.device_get(res.spec_stats)
        row["spec_decode"] = {
            "draft_len": SPEC,
            "tokens_per_step": round(float(st.get("tokens_per_step", 0)), 3),
            "verify_steps": int(st.get("iters", 0)),
            "acceptance_caveat":
                "random-weight stream; see tests/test_speculative.py",
        }
    return row


def _gauge_long() -> dict:
    """Long-decode row (the reference demo generates up to 512 new tokens,
    /root/reference/scripts/demo.py:46): fresh process, one timed iteration.
    The 512-step scan compiles its own program; keep it at unroll=1 (the
    headline's unroll=2 doubles the scan body for no measured long-row gain
    and feeds the remote-compiler memory ceiling)."""
    lb = LONG_BATCH or BATCH
    lkv = LONG_KV or KV_DTYPE
    os.environ["MMMM_DECODE_UNROLL"] = os.environ.get("MMMM_BENCH_LONG_UNROLL", "1")
    params, cfg, tokenizer = build_params()
    # The 512-step program has hit the remote-compiler memory ceiling in two
    # rounds (HTTP 500); a number at a degraded config beats a null row, so
    # walk a fallback ladder: configured -> ragged decode reads (smaller
    # scoped-VMEM footprint at smax=704) -> half batch (+ragged).
    ladder = [
        (lb, {}),
        (lb, {"MMMM_RAGGED_DECODE": "1"}),
        (max(8, lb // 2), {"MMMM_RAGGED_DECODE": "1"}),
    ]
    last = None
    for b_try, env in ladder:
        os.environ.update(env)
        try:
            # spec=0: the 512-step program sits at the remote-compiler memory
            # ceiling already; the long row stays greedy by construction
            lrun, _ = build_run(
                params, cfg, tokenizer, b_try, LONG_NEW_TOKENS, lkv, LONG_CHUNK,
                spec=0,
            )
            lrun()  # compile
            t0 = time.time()
            lrun()
            ldt = time.time() - t0
            return {
                "value": round(b_try / ldt, 3), "unit": "reports/sec/chip",
                "mfu": round(sum(_matmul_flops(cfg, b_try, PROMPT_LEN, LONG_NEW_TOKENS, N_VIS)) / ldt / V5E_PEAK_BF16, 4),
                "batch": b_try, "new_tokens": LONG_NEW_TOKENS, "kv_cache": lkv,
                **({"fallback": env} if env or b_try != lb else {}),
            }
        except Exception as e:  # noqa: BLE001 — try the next rung
            last = f"{type(e).__name__}: {str(e)[:200]}"
            lrun = None  # noqa: F841 — release device inputs before the next rung
            print(f"[bench] long rung b={b_try} {env} failed: {last}",
                  file=sys.stderr, flush=True)
    raise RuntimeError(f"long gauge: every ladder rung failed; last: {last}")


def _gauge_spec() -> dict:
    """Speculative-decoding gauge: SPEC_ROW-token n-gram draft at the
    headline batch (the spec path prefills chunked too). Caveat travels with
    the row: random-weight acceptance is unrepresentative of real reports —
    tests/test_speculative.py pins the structured-text value instead."""
    params, cfg, tokenizer = build_params()
    sres = None
    # ladder: the r5 canonical run OOM'd at B48 on the TIMED pass — the warm
    # run's result tree was still live while the second run executed (spec
    # holds draft tables on top of the greedy residents). The warm result is
    # now dropped before timing, and smaller batches back it up.
    for sb in dict.fromkeys((BATCH, 40, 24)):
        chunk = PREFILL_CHUNK if PREFILL_CHUNK < sb else 0
        srun = None
        try:
            srun, _ = build_run(
                params, cfg, tokenizer, sb, MAX_NEW_TOKENS, KV_DTYPE,
                chunk, spec=SPEC_ROW,
            )
            srun()  # compile + warm; result buffers released immediately
            t0 = time.time()
            sres = srun()
            sdt = time.time() - t0
            break
        except Exception as e:  # noqa: BLE001
            srun = None  # release device inputs before the fallback batch
            sres = None
            print(f"[bench] spec rung b={sb} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr, flush=True)
    if sres is None:
        raise RuntimeError("spec gauge: every batch rung failed")
    st = jax.device_get(sres.spec_stats) if sres.spec_stats else {}
    return {
        "value": round(sb / sdt, 3), "unit": "reports/sec/chip",
        "batch": sb, "draft_len": SPEC_ROW,
        "tokens_per_step": round(float(st.get("tokens_per_step", 0)), 3),
        "verify_steps": int(st.get("iters", 0)),
        "acceptance_caveat": "random-weight stream; see tests/test_speculative.py",
    }


def _gauge_prefill() -> dict:
    """Prefill-only MFU gauge (separate jit of the identical prefill
    computation, at the chunk batch when chunked prefill is on)."""
    pf_batch = PREFILL_CHUNK if 0 < PREFILL_CHUNK < BATCH else BATCH
    params, cfg, _ = build_params()
    prefill_flops, _ = _matmul_flops(cfg, pf_batch, PROMPT_LEN,
                                     MAX_NEW_TOKENS, N_VIS)
    prefill_run = build_prefill(params, cfg, pf_batch)
    prefill_run()  # compile
    n_iters = 3
    t0 = time.time()
    for _ in range(n_iters):
        prefill_run()
    prefill_dt = (time.time() - t0) / n_iters
    return {"prefill_mfu": round(prefill_flops / prefill_dt / V5E_PEAK_BF16, 4)}


_GAUGES = {
    "headline": _gauge_headline,
    "greedy": _gauge_headline,  # greedy control: spec disabled via child env
    "long": _gauge_long,
    "spec": _gauge_spec,
    "prefill": _gauge_prefill,
}


def _spawn_gauge(gauge: str, retries: int = 1, timeout_s: float = 5400.0) -> dict:
    """Run one gauge in a fresh subprocess with its own device client, so the
    B48 headline's resident state can't RESOURCE_EXHAUST the later gauges and
    a transient relay HTTP 500 only costs a row retry (VERDICT r4 #2). The
    child prints its row as the last stdout line."""
    import subprocess

    env = dict(os.environ, MMMM_BENCH_GAUGE=gauge)
    if gauge == "greedy":
        env["MMMM_BENCH_SPEC"] = "0"
    last_err = ""
    for attempt in range(retries + 1):
        if attempt:
            print(f"[bench] retrying gauge {gauge}: {last_err[-300:]}",
                  file=sys.stderr, flush=True)
            _wait_for_backend(float(os.environ.get("MMMM_BENCH_WAIT", "1800")))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, env=env, timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            last_err = f"gauge subprocess timeout ({timeout_s:.0f}s)"
            continue
        sys.stderr.write(proc.stderr[-2000:])
        lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
        if proc.returncode == 0 and lines:
            try:
                return json.loads(lines[-1])
            except json.JSONDecodeError:
                last_err = f"unparseable gauge output: {lines[-1][:200]}"
        else:
            last_err = (proc.stderr.strip().splitlines() or ["no stderr"])[-1]
    return {"error": last_err[-300:]}


def main():
    gauge = os.environ.get("MMMM_BENCH_GAUGE")
    if gauge:
        # child mode: run exactly one gauge against a fresh device client
        _wait_for_backend(float(os.environ.get("MMMM_BENCH_WAIT", "1800")))
        print(json.dumps(_GAUGES[gauge]()), flush=True)
        return

    # orchestrator mode: never initializes a device client itself — every
    # measurement runs in a per-gauge subprocess that owns the whole chip
    _wait_for_backend(float(os.environ.get("MMMM_BENCH_WAIT", "1800")))
    head = _spawn_gauge("headline")
    if "error" in head:
        raise RuntimeError(f"headline gauge failed: {head['error']}")
    reports_per_sec = head["value"]
    print(f"[bench] headline {reports_per_sec:.2f} rep/s", file=sys.stderr, flush=True)

    long_row = None
    if LONG_NEW_TOKENS:
        long_row = _spawn_gauge("long")
        print(f"[bench] long_decode {long_row}", file=sys.stderr, flush=True)

    spec_row = None
    greedy_row = None
    if SPEC:
        # headline runs speculative decode (token-identical; r5 default) —
        # emit a greedy control row for cross-round comparability
        greedy_row = _spawn_gauge("greedy")
        print(f"[bench] greedy_control {greedy_row}", file=sys.stderr, flush=True)
        spec_row = head.get("spec_decode")
    elif SPEC_ROW:
        spec_row = _spawn_gauge("spec")
        print(f"[bench] spec {spec_row}", file=sys.stderr, flush=True)

    pf = _spawn_gauge("prefill")
    prefill_mfu = pf.get("prefill_mfu")
    if "error" in pf:
        print(f"[bench] prefill gauge failed: {pf['error']}",
              file=sys.stderr, flush=True)

    input_rate = bench_input_pipeline()

    baseline = None
    if BASELINE_PATH.exists():
        rec = json.loads(BASELINE_PATH.read_text())
        if rec.get("metric_version") == METRIC_VERSION:
            baseline = rec["reports_per_sec"]
    if baseline is None:
        baseline = reports_per_sec
        BASELINE_PATH.write_text(json.dumps(
            {"metric_version": METRIC_VERSION, "reports_per_sec": reports_per_sec}
        ))
    print(
        json.dumps(
            {
                "metric": "grounded_report_generation_throughput_6.5b",
                "value": round(reports_per_sec, 3),
                "unit": "reports/sec/chip",
                # NOTE: the baseline is this repo's OWN first metric-v2 run
                # (2.88 rep/s, round 2) — the reference publishes no numbers
                # (BASELINE.md); this gauge tracks self-relative progress
                "vs_baseline": round(reports_per_sec / baseline, 3),
                "baseline_def": "self: first v2 run (BENCH_BASELINE.json)",
                "mfu": head["mfu"],
                "prefill_mfu": prefill_mfu,
                "input_volumes_per_sec": round(input_rate, 2),
                "input_bound": bool(input_rate < reports_per_sec),
                "batch": BATCH,
                "new_tokens": MAX_NEW_TOKENS,
                "prefill_chunk": PREFILL_CHUNK,
                "long_decode": long_row,
                "spec": spec_row,
                "greedy_control": greedy_row,
                "kv_cache": KV_DTYPE,
                "quantized": os.environ.get("MMMM_BENCH_QUANT", "1") != "0",
                "weight_bits": 4 if os.environ.get("MMMM_BENCH_QUANT") == "4"
                else (8 if os.environ.get("MMMM_BENCH_QUANT", "1") != "0" else 16),
                # MMMM_W8A8=1: decode matmuls run native int8 x int8 with
                # dynamic per-row activation scales (see ops/quant.qdot)
                "act_bits": 8 if os.environ.get("MMMM_W8A8", "0") == "1" else 16,
            }
        )
    )


if __name__ == "__main__":
    main()
