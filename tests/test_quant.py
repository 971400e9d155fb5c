"""Int8 weight-only serving quantization (W8A16): math, transform, generation."""
import jax
import jax.numpy as jnp
import numpy as np

from mmmm_tpu.models.cogvlm import CogVLMConfig
from mmmm_tpu.models.cogvlm.decoder import init_llm_params, llm_forward
from mmmm_tpu.ops.quant import is_quantized, qdot, quantize_int8, quantize_llm_for_serving


def test_quantize_int8_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4, 32, 16)) * 0.1, jnp.float32)
    qw = quantize_int8(w)
    assert qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (4, 1, 16)
    deq = qw["q"].astype(jnp.float32) * qw["s"]
    # per-channel 8-bit: relative error bounded by scale/2 per element
    assert float(jnp.max(jnp.abs(deq - w))) <= float(jnp.max(qw["s"])) * 0.51


def test_qdot_matches_dense_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 16)) * 0.05, jnp.float32)
    qw = quantize_int8(w[None])  # stacked form
    lw = jax.tree.map(lambda a: a[0], qw)  # per-layer slice, like lax.scan does
    got = qdot(x, lw)
    want = x @ (lw["q"].astype(jnp.float32) * lw["s"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    # plain weights pass through
    np.testing.assert_allclose(np.asarray(qdot(x, w)), np.asarray(x @ w), rtol=1e-6)


def test_quantized_forward_close_and_generation_runs():
    cfg = CogVLMConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
    )
    llm = init_llm_params(jax.random.PRNGKey(0), cfg)
    params = {"llm": llm}
    qparams = quantize_llm_for_serving(params, release_originals=False)
    assert is_quantized(qparams["llm"]["layers"]["lang_qkv"])
    assert is_quantized(qparams["llm"]["lm_head"])
    # original untouched
    assert not is_quantized(params["llm"]["layers"]["lang_qkv"])

    rng = np.random.default_rng(0)
    b, s = 2, 16
    emb = jnp.asarray(rng.normal(size=(b, s, 64)) * 0.1, jnp.float32)
    tt = jnp.zeros((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s)).astype(jnp.int32)
    seg = jnp.ones((b, s), jnp.int32)
    ref = llm_forward(params["llm"], cfg, emb, tt, pos, seg, attn_impl="xla")
    got = llm_forward(qparams["llm"], cfg, emb, tt, pos, seg, attn_impl="xla")
    err = float(jnp.max(jnp.abs(got - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.05, (err, scale)

    # greedy generation end to end on quantized weights
    from mmmm_tpu.models.generate import greedy_generate

    ids = jnp.asarray(rng.integers(4, 120, size=(b, s)), jnp.int32)
    res = greedy_generate(
        qparams, cfg, ids, tt, pos, jnp.full((b,), s, jnp.int32),
        max_new_tokens=4, eos_token_id=2, bop_token_id=100, eop_token_id=101,
        attn_impl="xla",
    )
    assert res.tokens.shape == (b, 4)


def test_quantize_kv_roundtrip():
    from mmmm_tpu.ops.quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 32, 16)), jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 4, 32, 1)
    back = dequantize_kv(q, s, jnp.float32)
    rel = float(jnp.max(jnp.abs(back - x)) / jnp.max(jnp.abs(x)))
    assert rel < 0.01, rel


def test_decode_attention_q8_matches_dequantized():
    from mmmm_tpu.ops.attention import decode_attention_bhsd
    from mmmm_tpu.ops.decode_kernel import decode_attention_pallas_q8
    from mmmm_tpu.ops.quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(1)
    b, h, smax, d = 2, 4, 64, 16
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    kv_len = jnp.asarray([40, 64], jnp.int32)
    got = decode_attention_pallas_q8(q, kq, ks, vq, vs, kv_len)
    valid = jnp.arange(smax)[None, :] < kv_len[:, None]
    want = decode_attention_bhsd(
        q, dequantize_kv(kq, ks, jnp.float32), dequantize_kv(vq, vs, jnp.float32), valid
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_generate_int8_kv_cache_matches_bf16_tokens():
    """int8 KV serving: a confidently-separated tiny model decodes the SAME
    token sequence with the int8 cache as with the bf16 cache."""
    from mmmm_tpu.models.cogvlm import CogVLMConfig
    from mmmm_tpu.models.cogvlm.decoder import init_llm_params
    from mmmm_tpu.models.generate import greedy_generate

    cfg = CogVLMConfig.tiny()
    llm = init_llm_params(jax.random.PRNGKey(0), cfg)
    llm["lm_head"] = llm["lm_head"] * 5.0  # strong logit separation
    params = {"llm": llm}
    rng = np.random.default_rng(0)
    b, s = 2, 16
    ids = jnp.asarray(rng.integers(4, 120, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s)).astype(jnp.int32)
    kw = dict(
        max_new_tokens=6, eos_token_id=-1, bop_token_id=-2, eop_token_id=-3,
        attn_impl="xla",
    )
    ref = greedy_generate(params, cfg, ids, tt, pos, jnp.full((b,), s, jnp.int32), **kw)
    got = greedy_generate(
        params, cfg, ids, tt, pos, jnp.full((b,), s, jnp.int32),
        kv_cache_dtype="int8", **kw,
    )
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))


def test_int4_pack_unpack_roundtrip():
    from mmmm_tpu.ops.w4_matmul import pack_int4, unpack_int4

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.integers(-8, 8, size=(256, 256)), jnp.int8)
    np.testing.assert_array_equal(np.asarray(unpack_int4(pack_int4(q))), np.asarray(q))


def test_quantize_int4_dequant_error_bound():
    from mmmm_tpu.ops.quant import quantize_int4
    from mmmm_tpu.ops.w4_matmul import unpack_int4

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(512, 256)) * 0.05, jnp.float32)
    qw = quantize_int4(w, group=128)
    assert qw["q4"].shape == (256, 256) and qw["s4"].shape == (4, 256)
    deq = unpack_int4(qw["q4"]).astype(jnp.float32) * jnp.repeat(qw["s4"], 128, axis=0)
    # 4-bit group-wise: error per element bounded by half its group scale
    err = jnp.abs(deq - w)
    bound = jnp.repeat(qw["s4"], 128, axis=0) * 0.51
    assert bool(jnp.all(err <= bound))


def test_w4_kernel_matches_xla_fallback():
    """Pallas kernel (interpret on CPU) == XLA unpack+matmul reference."""
    from mmmm_tpu.ops.quant import quantize_int4
    from mmmm_tpu.ops.w4_matmul import w4_matmul, w4_matmul_xla

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(16, 512)), jnp.float32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(512, 512)) * 0.05, jnp.float32)
    qw = quantize_int4(w, group=128)
    got = w4_matmul(x, qw["q4"], qw["s4"], out_dtype=jnp.float32)
    want = w4_matmul_xla(x, qw["q4"], qw["s4"], out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05)


def test_qdot_int4_matches_dense():
    from mmmm_tpu.ops.quant import quantize_int4

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 7, 512)), jnp.float32)  # odd M -> pad path
    w = jnp.asarray(rng.normal(size=(512, 256)) * 0.05, jnp.float32)
    qw = quantize_int4(w, group=128)
    got = qdot(x.astype(jnp.bfloat16), qw)
    assert got.shape == (2, 7, 256)
    want = x @ w
    # int4 group-128 on gaussian weights: err std ~= scale/sqrt(12) ~= 0.14
    # of the signal (analytic); assert we're at that floor, not above it
    denom = float(jnp.std(want)) + 1e-9
    rel = float(jnp.std(got.astype(jnp.float32) - want)) / denom
    assert rel < 0.15, rel


def test_w4_serving_transform_and_forward():
    """bits=4 serving transform: experts int4, lm_head int8; forward close."""
    cfg = CogVLMConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4,
    )
    llm = init_llm_params(jax.random.PRNGKey(1), cfg)
    params = {"llm": llm}
    qparams = quantize_llm_for_serving(params, release_originals=False, bits=4)
    assert "q4" in qparams["llm"]["layers"]["lang_qkv"]
    assert "q" in qparams["llm"]["lm_head"]  # forced int8

    rng = np.random.default_rng(6)
    b, s = 2, 16
    emb = jnp.asarray(rng.normal(size=(b, s, 256)) * 0.1, jnp.float32)
    tt = jnp.zeros((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s)).astype(jnp.int32)
    seg = jnp.ones((b, s), jnp.int32)
    ref = llm_forward(params["llm"], cfg, emb, tt, pos, seg, attn_impl="xla")
    got = llm_forward(qparams["llm"], cfg, emb, tt, pos, seg, attn_impl="xla")
    denom = float(jnp.std(ref)) + 1e-9
    assert float(jnp.std(got - ref)) / denom < 0.15


def test_w4_generate_runs_and_deterministic():
    """W4 params drive the full prefill+decode loop (q4 leaves through
    lax.scan layer slicing and the decode-step qdot path)."""
    from mmmm_tpu.models.generate import greedy_generate

    cfg = CogVLMConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4,
    )
    llm = init_llm_params(jax.random.PRNGKey(2), cfg)
    qparams = quantize_llm_for_serving({"llm": llm}, release_originals=False, bits=4)
    rng = np.random.default_rng(7)
    b, s = 2, 16
    ids = jnp.asarray(rng.integers(4, 120, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s)).astype(jnp.int32)
    kw = dict(max_new_tokens=5, eos_token_id=-1, bop_token_id=-2, eop_token_id=-3,
              attn_impl="xla")
    out1 = greedy_generate(qparams, cfg, ids, tt, pos, jnp.full((b,), s, jnp.int32), **kw)
    out2 = greedy_generate(qparams, cfg, ids, tt, pos, jnp.full((b,), s, jnp.int32), **kw)
    assert out1.tokens.shape == (b, 5)
    assert bool(jnp.all(jnp.isfinite(out1.hidden.astype(jnp.float32))))
    np.testing.assert_array_equal(np.asarray(out1.tokens), np.asarray(out2.tokens))


def test_decode_attention_q8_ragged_matches_dequantized():
    """Length-aware int8-KV kernel == masked dequantized reference for varied
    kv_len (sub-block, boundary, full)."""
    from mmmm_tpu.ops.attention import decode_attention_bhsd
    from mmmm_tpu.ops.decode_kernel import decode_attention_pallas_q8_ragged
    from mmmm_tpu.ops.quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(3)
    b, h, smax, d = 3, 8, 96, 16
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    kv_len = jnp.asarray([7, 64, 96], jnp.int32)
    got = decode_attention_pallas_q8_ragged(q, kq, ks, vq, vs, kv_len, block_s=32)
    valid = jnp.arange(smax)[None, :] < kv_len[:, None]
    want = decode_attention_bhsd(
        q, dequantize_kv(kq, ks, jnp.float32), dequantize_kv(vq, vs, jnp.float32), valid
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_q14_split_exact():
    """The split-int8 encoding reconstructs the 14-bit quantization exactly:
    x14 == 128*hi + lo with hi, lo in int8 range."""
    from mmmm_tpu.ops.decode_kernel import _q14_split

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 5, 1, 32)) * 7.0, jnp.float32)
    hi, lo, s = _q14_split(x, amax_axes=(-1, -2))
    assert hi.dtype == jnp.int8 and lo.dtype == jnp.int8
    assert int(jnp.min(lo)) >= 0 and int(jnp.max(lo)) <= 127
    recon = (hi.astype(jnp.int32) * 128 + lo.astype(jnp.int32)).astype(jnp.float32) * s
    x14 = jnp.round(x / s) * s
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x14), rtol=0, atol=0)
    # 14-bit quantization error bound: half a step
    assert float(jnp.max(jnp.abs(recon - x) / s)) <= 0.5 + 1e-5


def test_decode_attention_q8_mxu_matches_dequantized():
    """The MXU split-int8 kernel matches the dequantized reference at least as
    tightly as the VPU-dequant kernel (14-bit weight precision)."""
    from mmmm_tpu.ops.attention import decode_attention_bhsd
    from mmmm_tpu.ops.decode_kernel import decode_attention_pallas_q8_mxu
    from mmmm_tpu.ops.quant import dequantize_kv, quantize_kv

    rng = np.random.default_rng(3)
    b, h, smax, d = 2, 8, 64, 16
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    kv_len = jnp.asarray([40, 64], jnp.int32)
    got = decode_attention_pallas_q8_mxu(q, kq, ks, vq, vs, kv_len)
    valid = jnp.arange(smax)[None, :] < kv_len[:, None]
    want = decode_attention_bhsd(
        q, dequantize_kv(kq, ks, jnp.float32), dequantize_kv(vq, vs, jnp.float32), valid
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_decode_attention_q8_dispatch(monkeypatch):
    """decode_attention_pallas_q8 routes to the VPU-dequant kernel by default
    (the MXU kernel measured slower on-chip — Mosaic emulates si8 matmuls)
    and to the MXU kernel under MMMM_Q8_MXU=1; outputs agree."""
    from mmmm_tpu.ops.decode_kernel import decode_attention_pallas_q8
    from mmmm_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(4)
    b, h, smax, d = 2, 4, 64, 16
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    kq, ks = quantize_kv(jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.float32))
    vq, vs = quantize_kv(jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.float32))
    kv_len = jnp.asarray([33, 64], jnp.int32)
    monkeypatch.setenv("MMMM_Q8_MXU", "1")
    mxu = decode_attention_pallas_q8(q, kq, ks, vq, vs, kv_len)
    monkeypatch.delenv("MMMM_Q8_MXU", raising=False)
    vpu = decode_attention_pallas_q8(q, kq, ks, vq, vs, kv_len)
    np.testing.assert_allclose(np.asarray(mxu), np.asarray(vpu), rtol=4e-3, atol=4e-3)


def test_qdot_act_quant_math():
    """W8A8 qdot (native int8 x int8, dynamic per-row activation scales)
    matches the explicit quantize->int32-dot->rescale reference exactly, and
    stays within the combined 8+8-bit error of the exact product."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(6, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(32, 24)) * 0.05, jnp.float32)
    qw = quantize_int8(w)
    got = qdot(x, qw, act_quant=True)
    # reference: same quantization, plain numpy
    xf = np.asarray(x, np.float32)
    sx = np.maximum(np.abs(xf).max(axis=1, keepdims=True), 1e-8) / 127.0
    xq = np.round(xf / sx).astype(np.int8)
    y = (xq.astype(np.int32) @ np.asarray(qw["q"], np.int32)).astype(np.float32)
    want = y * sx * np.asarray(qw["s"], np.float32)[0]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want.astype(np.float32), rtol=1e-2, atol=1e-2
    )
    exact = xf @ np.asarray(w, np.float32)
    err = np.abs(np.asarray(got, np.float32) - exact)
    scale = np.abs(exact).max()
    assert err.max() / scale < 0.03, err.max() / scale


def test_decode_step_w8a8_close_to_w8a16(monkeypatch):
    """MMMM_W8A8=1 swaps the lang-only decode matmuls to native int8 dots;
    the step's hidden output stays close to the W8A16 path (activation
    quantization adds ~0.4% relative error per matmul)."""
    from mmmm_tpu.models.cogvlm.decoder import llm_decode_step

    cfg = CogVLMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
    )
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_llm_for_serving({"llm": params, "vision": {}})["llm"]
    b, smax = 2, 8
    rng = np.random.default_rng(6)
    emb = jnp.asarray(rng.normal(size=(b, 1, 32)) * 0.3, jnp.float32)
    tt = jnp.zeros((b, 2), jnp.int32)
    pos = jnp.full((b, 1), 3, jnp.int32)
    caches = [
        (jnp.asarray(rng.normal(size=(b, 4, smax, 8)) * 0.3, jnp.float32),
         jnp.asarray(rng.normal(size=(b, 4, smax, 8)) * 0.3, jnp.float32))
        for _ in range(2)
    ]
    write = jnp.full((b,), 3, jnp.int32)
    kv_len = write + 1

    def step():
        h, _ = llm_decode_step(
            qparams, cfg, emb, tt, pos, caches, write, kv_len, attn_impl="xla"
        )
        return np.asarray(h, np.float32)

    monkeypatch.delenv("MMMM_W8A8", raising=False)
    base = step()
    monkeypatch.setenv("MMMM_W8A8", "1")
    got = step()
    rel = np.abs(got - base).max() / (np.abs(base).max() + 1e-9)
    assert 0 < rel < 0.05, rel  # changed (quantized) but close
