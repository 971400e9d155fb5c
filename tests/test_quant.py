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
