"""Continuous batching: slot-pool greedy serving == static batched generation."""
import jax
import jax.numpy as jnp
import numpy as np

from mmmm_tpu.data import MMMMTokenizer
from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.models.llm_batch import make_text_generator
from mmmm_tpu.models.serving import TextServer


def _setup():
    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok)).vlm
    params = MMMMModel(MMMMConfig.tiny(vocab_size=len(tok))).init(
        jax.random.PRNGKey(0)
    )["cogvlm"]
    return tok, cfg, params


def test_continuous_batching_matches_static():
    """Each prompt's completion is independent of slot assignment, refill
    timing, and pool neighbors — identical to the static llm_batch path."""
    tok, cfg, params = _setup()
    prompts = [
        "a", "the quick brown fox", "mid", "another prompt here",
        "yet another much longer prompt for the pool", "zz", "last one",
    ]
    static = make_text_generator(
        params, cfg, tok, max_new_tokens=6, batch_size=2, attn_impl="xla"
    )(prompts)
    server = TextServer(
        params, cfg, tok, n_slots=2, max_new_tokens=6, chunk=3,
        seq_quant=16, max_prompt_len=64, attn_impl="xla",
    )
    served = server.generate(prompts)
    assert served == static


def test_server_refills_mid_flight():
    """Finished slots are refilled while neighbors are still mid-request (the
    continuous-batching property), and the chunk count is near the ideal
    total_tokens / (slots * chunk) floor rather than a wait-for-all schedule."""
    tok, cfg, params = _setup()
    prompts = ["one", "two", "three", "four", "five", "six"]
    # staggered per-request budgets: short requests free their slot while the
    # long ones are still decoding
    budgets = [2, 8, 2, 2, 8, 2]
    server = TextServer(
        params, cfg, tok, n_slots=2, max_new_tokens=8, chunk=2,
        seq_quant=16, max_prompt_len=64, attn_impl="xla",
    )
    outs = server.generate(prompts, max_new=budgets)
    assert all(isinstance(o, str) for o in outs) and len(outs) == 6
    assert [len(tok.encode(o)) <= b for o, b in zip(outs, budgets)]
    assert server.stats["refills"] >= 3
    assert server.stats["refilled_mid_flight"] >= 1
    # 24 total tokens / (2 slots x 2/chunk) = 6 ideal chunks; allow bubbles
    assert server.stats["chunks"] <= 12


def test_prefix_cache_matches_full_prefill():
    """Automatic prefix caching: templated prompts (one shared instruction
    prefix + per-request bodies) produce byte-identical completions whether
    each prompt is prefilled in full or only its suffix is prefilled against
    the shared-prefix KV (vLLM's APC property, TPU-style: one extra compiled
    suffix-window program, no dynamic shapes)."""
    tok, cfg, params = _setup()
    template = "You are a radiology assistant. Extract findings from: "
    bodies = ["small nodule", "clear lungs", "effusion on the left", "x",
              "cardiomegaly with edema"]
    prompts = [template + b for b in bodies]
    base = TextServer(
        params, cfg, tok, n_slots=2, max_new_tokens=6, chunk=3,
        seq_quant=16, max_prompt_len=128, attn_impl="xla", prefix_cache=False,
    ).generate(prompts)
    server = TextServer(
        params, cfg, tok, n_slots=2, max_new_tokens=6, chunk=3,
        seq_quant=16, max_prompt_len=128, attn_impl="xla",
    )
    served = server.generate(prompts)
    assert served == base
    # the byte tokenizer gives ~1 token/char: the 55-char template must have
    # been detected and reused for every request after the first
    assert server.stats["prefix_len"] >= 32
    assert server.stats["prefix_tokens_saved"] >= 32 * (len(prompts) - 1)


def test_prefix_cache_skips_unshared_jobs():
    """No common template -> the detector leaves the normal path untouched."""
    tok, cfg, params = _setup()
    server = TextServer(
        params, cfg, tok, n_slots=2, max_new_tokens=4, chunk=2,
        seq_quant=16, max_prompt_len=64, attn_impl="xla",
    )
    outs = server.generate(["alpha beta", "gamma delta epsilon", "zeta"])
    assert len(outs) == 3
    assert server.stats["prefix_len"] == 0


def test_speculative_server_matches_greedy_server():
    """Continuous batching x n-gram speculation: the slot pool running verify
    windows commits exactly the greedy token stream (same completions, same
    budgets), with >= 1 token per verify step. Composed with prefix caching
    to cover both refill paths feeding the spec state."""
    tok, cfg, params = _setup()
    template = "Findings template shared by every request in this job: "
    bodies = ["aaa bbb aaa bbb aaa", "repeat repeat repeat", "q", "zz yy zz yy"]
    prompts = [template + b for b in bodies]
    budgets = [7, 3, 9, 5]
    kw = dict(n_slots=2, max_new_tokens=9, chunk=3, seq_quant=16,
              max_prompt_len=128, attn_impl="xla")
    base = TextServer(params, cfg, tok, **kw).generate(prompts, max_new=budgets)
    spec = TextServer(params, cfg, tok, speculate=4, **kw)
    outs = spec.generate(prompts, max_new=budgets)
    assert outs == base
    assert spec.stats["prefix_len"] >= 32  # both features active together
    assert spec.stats["spec_steps"] > 0
    assert spec.stats["spec_committed"] >= spec.stats["spec_steps"]


N_VIS = 1 * 4 * 4 + 2  # (3,4,16,16) image, patch 4, pool 1 -> 16 tokens + boi/eoi


def _grounded_reqs(b=5):
    import numpy as _np

    rng = _np.random.default_rng(0)
    reqs = []
    for i in range(b):
        text_len = 6 + 3 * i
        s = 1 + N_VIS + text_len
        ids = _np.concatenate([
            [1], _np.full(N_VIS, 3), rng.integers(4, 250, size=text_len)
        ]).astype(_np.int32)
        tt = _np.zeros(s, _np.int32)
        tt[1 : 1 + N_VIS] = 1
        pos = _np.concatenate([
            [0, 1], _np.full(N_VIS - 2, 2), [3], _np.arange(4, 4 + text_len)
        ]).astype(_np.int32)
        reqs.append({
            "input_ids": ids, "token_type_ids": tt, "position_ids": pos,
            "image": rng.normal(size=(3, 4, 16, 16)).astype(_np.float32),
            "grounding_image": rng.normal(size=(3, 4, 16, 16)).astype(_np.float32),
        })
    return reqs


def test_grounded_server_matches_batch_path():
    """GroundedServer (continuous multimodal serving) produces the same texts
    and SAM masks as the one-shot generate_grounded batch path."""
    import numpy as _np

    from mmmm_tpu.models.inference import generate_grounded
    from mmmm_tpu.models.serving import GroundedServer

    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok))
    params = MMMMModel(cfg).init(jax.random.PRNGKey(0))

    n_vis = N_VIS
    patch, pool = (4, 4, 4), (1, 1, 1)
    b = 5
    reqs = _grounded_reqs(b)

    # reference: one batched generate_grounded over all requests (right-pad)
    smax = max(len(r["input_ids"]) for r in reqs)
    pad = lambda k: _np.stack([
        _np.pad(r[k], (0, smax - len(r[k]))) for r in reqs
    ])
    ref = generate_grounded(
        params, cfg, tok,
        jnp.asarray(pad("input_ids")), jnp.asarray(pad("token_type_ids")),
        jnp.asarray(pad("position_ids")),
        jnp.asarray([len(r["input_ids"]) for r in reqs]),
        jnp.asarray(_np.stack([r["image"] for r in reqs])), patch, pool,
        max_new_tokens=6, max_targets=2,
        grounding_image=jnp.asarray(_np.stack([r["grounding_image"] for r in reqs])),
        force_grounding=True, vis_span=(1, 1 + n_vis), attn_impl="xla",
    )

    server = GroundedServer(
        params, cfg, tok, patch_size=patch, pool_size=pool, n_vis=n_vis,
        n_slots=2, max_new_tokens=6, chunk=3, seq_quant=16,
        max_prompt_len=smax, max_targets=2, attn_impl="xla",
    )
    out = server.generate(reqs)

    assert [o["text"] for o in out] == ref.text
    assert server.stats["refills"] >= 2
    for i in range(b):
        _np.testing.assert_allclose(
            _np.asarray(out[i]["masks"]), _np.asarray(ref.masks)[i], atol=2e-4
        )


def test_grounded_server_speculative_matches_greedy():
    """Speculative grounded serving: same texts AND the same SAM masks as the
    greedy server — the k-wide ring-buffer writes must preserve the exact
    hidden state of every </p> position that prompts the SAM pass."""
    import numpy as _np

    from mmmm_tpu.models.serving import GroundedServer

    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok))
    params = MMMMModel(cfg).init(jax.random.PRNGKey(0))
    reqs = _grounded_reqs(4)
    smax = max(len(r["input_ids"]) for r in reqs)
    kw = dict(patch_size=(4, 4, 4), pool_size=(1, 1, 1), n_vis=N_VIS,
              n_slots=2, max_new_tokens=6, chunk=3, seq_quant=16,
              max_prompt_len=smax, max_targets=2, attn_impl="xla")
    base = GroundedServer(params, cfg, tok, **kw).generate(reqs)
    spec_srv = GroundedServer(params, cfg, tok, speculate=3, **kw)
    out = spec_srv.generate(reqs)
    assert [o["text"] for o in out] == [o["text"] for o in base]
    assert spec_srv.stats["spec_steps"] > 0
    for i in range(len(reqs)):
        _np.testing.assert_allclose(
            _np.asarray(out[i]["masks"]), _np.asarray(base[i]["masks"]), atol=2e-4
        )


def test_text_server_with_w8a16_params():
    """Continuous batching over int8-quantized serving weights (the
    production mode) == static quantized generation."""
    from mmmm_tpu.ops.quant import quantize_llm_for_serving

    tok, cfg, params = _setup()
    qparams = quantize_llm_for_serving(params)
    prompts = ["alpha", "a longer beta prompt", "gamma!"]
    kw = dict(max_new_tokens=5, batch_size=2, seq_quant=16, attn_impl="xla")
    static = make_text_generator(qparams, cfg, tok, **kw)(prompts)
    cont = make_text_generator(qparams, cfg, tok, continuous=True, **kw)(prompts)
    assert cont == static


def test_chunked_prefill_matches_fused():
    """prefill_chunk > 0 (the large-batch serving path: prefill in batch
    sub-chunks, decode at full batch) is token- and mask-identical to the
    fused single-program path — prefill is batch-parallel, so chunking must
    change nothing numerically. Covers an uneven tail chunk (b=5, chunk=2)."""
    import numpy as _np

    from mmmm_tpu.models.inference import generate_grounded
    from mmmm_tpu.models.serving import GroundedServer  # noqa: F401 (import parity)

    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok))
    params = MMMMModel(cfg).init(jax.random.PRNGKey(0))
    patch, pool = (4, 4, 4), (1, 1, 1)
    reqs = _grounded_reqs(5)
    smax = max(len(r["input_ids"]) for r in reqs)
    pad = lambda k: _np.stack([
        _np.pad(r[k], (0, smax - len(r[k]))) for r in reqs
    ])
    args = (
        params, cfg, tok,
        jnp.asarray(pad("input_ids")), jnp.asarray(pad("token_type_ids")),
        jnp.asarray(pad("position_ids")),
        jnp.asarray([len(r["input_ids"]) for r in reqs]),
        jnp.asarray(_np.stack([r["image"] for r in reqs])), patch, pool,
    )
    kw = dict(
        max_new_tokens=6, max_targets=2,
        grounding_image=jnp.asarray(_np.stack([r["grounding_image"] for r in reqs])),
        force_grounding=True, vis_span=(1, 1 + N_VIS), attn_impl="xla",
    )
    ref = generate_grounded(*args, **kw)
    for chunk in (2, 5):
        got = generate_grounded(*args, **kw, prefill_chunk=chunk)
        _np.testing.assert_array_equal(got.tokens, ref.tokens)
        assert got.text == ref.text
        _np.testing.assert_allclose(
            _np.asarray(got.masks), _np.asarray(ref.masks), atol=2e-4
        )


def test_chunked_prefill_vit_mode_matches_fused(monkeypatch):
    """MMMM_PREFILL_CHUNK_MODE=vit (chunk only the ViT under lax.map, run the
    LLM prefill once at full batch — one W8A16 dequant pass per batch instead
    of one per chunk) is token- and mask-identical to the fused path,
    including an uneven tail chunk."""
    import numpy as _np

    from mmmm_tpu.models.inference import generate_grounded

    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok))
    params = MMMMModel(cfg).init(jax.random.PRNGKey(0))
    patch, pool = (4, 4, 4), (1, 1, 1)
    reqs = _grounded_reqs(5)
    smax = max(len(r["input_ids"]) for r in reqs)
    pad = lambda k: _np.stack([
        _np.pad(r[k], (0, smax - len(r[k]))) for r in reqs
    ])
    args = (
        params, cfg, tok,
        jnp.asarray(pad("input_ids")), jnp.asarray(pad("token_type_ids")),
        jnp.asarray(pad("position_ids")),
        jnp.asarray([len(r["input_ids"]) for r in reqs]),
        jnp.asarray(_np.stack([r["image"] for r in reqs])), patch, pool,
    )
    kw = dict(
        max_new_tokens=6, max_targets=2,
        grounding_image=jnp.asarray(_np.stack([r["grounding_image"] for r in reqs])),
        force_grounding=True, vis_span=(1, 1 + N_VIS), attn_impl="xla",
    )
    ref = generate_grounded(*args, **kw)
    monkeypatch.setenv("MMMM_PREFILL_CHUNK_MODE", "vit")
    got = generate_grounded(*args, **kw, prefill_chunk=2)
    _np.testing.assert_array_equal(got.tokens, ref.tokens)
    assert got.text == ref.text
    _np.testing.assert_allclose(
        _np.asarray(got.masks), _np.asarray(ref.masks), atol=2e-4
    )


def test_sam_bf16_serving_knob(monkeypatch):
    """MMMM_SAM_BF16=1 (serving-only: run the SAM head in bf16 instead of the
    reference's fp32 training policy) leaves tokens untouched and moves mask
    SIGMOIDS by less than the decision noise floor."""
    import numpy as _np

    from mmmm_tpu.models.inference import generate_grounded

    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok))
    params = MMMMModel(cfg).init(jax.random.PRNGKey(0))
    patch, pool = (4, 4, 4), (1, 1, 1)
    reqs = _grounded_reqs(2)
    smax = max(len(r["input_ids"]) for r in reqs)
    pad = lambda k: _np.stack([
        _np.pad(r[k], (0, smax - len(r[k]))) for r in reqs
    ])
    args = (
        params, cfg, tok,
        jnp.asarray(pad("input_ids")), jnp.asarray(pad("token_type_ids")),
        jnp.asarray(pad("position_ids")),
        jnp.asarray([len(r["input_ids"]) for r in reqs]),
        jnp.asarray(_np.stack([r["image"] for r in reqs])), patch, pool,
    )
    kw = dict(
        max_new_tokens=4, max_targets=2,
        grounding_image=jnp.asarray(_np.stack([r["grounding_image"] for r in reqs])),
        force_grounding=True, vis_span=(1, 1 + N_VIS), attn_impl="xla",
    )
    ref = generate_grounded(*args, **kw)
    monkeypatch.setenv("MMMM_SAM_BF16", "1")
    got = generate_grounded(*args, **kw)
    _np.testing.assert_array_equal(got.tokens, ref.tokens)  # generation untouched
    sig = lambda x: 1 / (1 + _np.exp(-_np.asarray(x, _np.float32)))
    assert _np.max(_np.abs(sig(got.masks) - sig(ref.masks))) < 0.05


def test_chunked_prefill_int8_kv_matches_fused():
    """Chunked prefill composes with the int8 KV cache (the capacity option
    that enables the largest decode batches): identical tokens vs the fused
    int8 path."""
    import numpy as _np

    from mmmm_tpu.models.inference import generate_grounded

    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok))
    params = MMMMModel(cfg).init(jax.random.PRNGKey(0))
    patch, pool = (4, 4, 4), (1, 1, 1)
    reqs = _grounded_reqs(4)
    smax = max(len(r["input_ids"]) for r in reqs)
    pad = lambda k: _np.stack([
        _np.pad(r[k], (0, smax - len(r[k]))) for r in reqs
    ])
    args = (
        params, cfg, tok,
        jnp.asarray(pad("input_ids")), jnp.asarray(pad("token_type_ids")),
        jnp.asarray(pad("position_ids")),
        jnp.asarray([len(r["input_ids"]) for r in reqs]),
        jnp.asarray(_np.stack([r["image"] for r in reqs])), patch, pool,
    )
    kw = dict(max_new_tokens=5, vis_span=(1, 1 + N_VIS), attn_impl="xla",
              kv_cache_dtype="int8")
    ref = generate_grounded(*args, **kw)
    got = generate_grounded(*args, **kw, prefill_chunk=2)
    _np.testing.assert_array_equal(got.tokens, ref.tokens)
