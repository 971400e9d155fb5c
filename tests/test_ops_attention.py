"""Unit tests for segment-id attention: Pallas kernel vs XLA reference vs naive."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.ops import segment_attention, decode_attention
from mmmm_tpu.ops.attention import _build_mask, _xla_attention


def naive_attention(q, k, v, mask, scale):
    """Per-row softmax attention in float64-ish numpy for ground truth."""
    q, k, v = np.asarray(q, np.float64), np.asarray(k, np.float64), np.asarray(v, np.float64)
    b, sq, h, d = q.shape
    out = np.zeros_like(q)
    for bi in range(b):
        for hi in range(h):
            logits = q[bi, :, hi] @ k[bi, :, hi].T * scale
            logits = np.where(np.asarray(mask)[bi], logits, -np.inf)
            for i in range(sq):
                row = logits[i]
                if np.all(np.isinf(row) & (row < 0)):
                    continue
                p = np.exp(row - row.max())
                p = np.where(np.isfinite(row), p, 0.0)
                p = p / p.sum()
                out[bi, i, hi] = p @ v[bi, :, hi]
    return out


@pytest.mark.parametrize("causal", [False, True])
def test_xla_matches_naive(causal):
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 24, 3, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    # two segments + padding tail
    seg = jnp.asarray([[1] * 10 + [2] * 8 + [0] * 6, [1] * 24], jnp.int32)
    scale = d**-0.5
    out = segment_attention(q, k, v, seg, causal=causal, impl="xla")
    mask = _build_mask(seg, seg, causal)
    ref = naive_attention(q, k, v, mask, scale)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    # padded rows are exactly zero
    np.testing.assert_array_equal(np.asarray(out)[0, 18:], 0.0)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [24, 128, 200])
def test_pallas_matches_xla(causal, seq):
    rng = np.random.default_rng(1)
    b, h, d = 2, 2, 32
    q = jnp.asarray(rng.normal(size=(b, seq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, seq, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, seq, h, d)), jnp.float32)
    seg_np = np.zeros((b, seq), np.int32)
    seg_np[0, : seq // 2] = 1
    seg_np[0, seq // 2 : seq - 3] = 2
    seg_np[1, :] = 1
    seg = jnp.asarray(seg_np)
    out_x = segment_attention(q, k, v, seg, causal=causal, impl="xla")
    out_p = segment_attention(q, k, v, seg, causal=causal, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [40, 200])
def test_pallas_grad_matches_xla(causal, seq):
    """Flash backward kernels (dq + dk/dv) vs XLA autodiff, packed segments."""
    rng = np.random.default_rng(2)
    b, h, d = 2, 2, 16
    q = jnp.asarray(rng.normal(size=(b, seq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, seq, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, seq, h, d)), jnp.float32)
    seg_np = np.zeros((b, seq), np.int32)
    seg_np[0, : seq // 2] = 1
    seg_np[0, seq // 2 : seq - 5] = 2
    seg_np[1, :] = 1
    seg = jnp.asarray(seg_np)

    def loss(impl, q, k, v):
        out = segment_attention(q, k, v, seg, causal=causal, impl=impl)
        w = jnp.asarray(rng.normal(size=out.shape), jnp.float32) * 0 + 1.0
        return jnp.sum(out * out * 0.5 + out)

    gx = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gx, gp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4,
            err_msg=f"d{name} mismatch (causal={causal}, seq={seq})",
        )


def test_cross_attention_segments():
    """q and kv of different lengths (two-way transformer style)."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 5, 2, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 17, 2, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 17, 2, 8)), jnp.float32)
    qseg = jnp.ones((1, 5), jnp.int32)
    kseg = jnp.ones((1, 17), jnp.int32)
    out = segment_attention(q, k, v, qseg, kseg, impl="xla")
    mask = _build_mask(qseg, kseg, False)
    ref = naive_attention(q, k, v, mask, 8**-0.5)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_decode_attention_matches_full():
    """Decode path (1 query vs cache) == last row of full causal attention."""
    rng = np.random.default_rng(4)
    b, s, h, d = 2, 12, 2, 8
    q_full = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    seg = jnp.ones((b, s), jnp.int32)
    full = segment_attention(q_full, k, v, seg, causal=True, impl="xla")
    valid = jnp.ones((b, s), bool)
    dec = decode_attention(q_full[:, -1:], k, v, valid)
    np.testing.assert_allclose(np.asarray(dec[:, 0]), np.asarray(full[:, -1]), atol=1e-5)


def test_all_valid_fast_path_matches_masked():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmmm_tpu.ops import segment_attention

    rng = np.random.default_rng(11)
    b, s, h, d = 2, 17, 4, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    seg = jnp.ones((b, s), jnp.int32)
    ref = segment_attention(q, k, v, seg, impl="xla")
    got = segment_attention(q, k, v, seg, impl="xla", all_valid=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_dense_attention_kernel_matches_xla():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmmm_tpu.ops.attention import _xla_attention_dense
    from mmmm_tpu.ops.dense_attn import dense_attention

    rng = np.random.default_rng(12)
    b, s, h, d = 2, 130, 3, 24  # padded tail (130 -> 256) + odd head dim
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    scale = d ** -0.5
    got = dense_attention(q, k, v, scale)
    want = _xla_attention_dense(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # gradients flow through the custom_vjp (XLA recompute backward)
    f = lambda q_: jnp.sum(dense_attention(q_, k, v, scale) ** 2)
    fx = lambda q_: jnp.sum(_xla_attention_dense(q_, k, v, scale) ** 2)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(q)), np.asarray(jax.grad(fx)(q)), rtol=1e-4, atol=1e-4
    )


def test_ragged_decode_kernel_matches_reference():
    """Length-aware (block-skipping) decode kernel == masked XLA decode for
    varied kv_len, incl. block-boundary and sub-block lengths."""
    from mmmm_tpu.ops.attention import decode_attention_bhsd
    from mmmm_tpu.ops.decode_kernel import decode_attention_pallas_ragged

    rng = np.random.default_rng(7)
    b, h, d, smax = 4, 4, 128, 192  # 6 blocks of 32
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.float32)
    kv_len = jnp.asarray([1, 32, 97, 192], jnp.int32)
    valid = jnp.arange(smax)[None, :] < kv_len[:, None]
    ref = decode_attention_bhsd(q, k, v, valid)
    got = decode_attention_pallas_ragged(q, k, v, kv_len, block_s=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ragged_block_selection():
    from mmmm_tpu.ops.decode_kernel import _ragged_block

    assert _ragged_block(320) == 64
    assert _ragged_block(512) == 128
    assert _ragged_block(128) is None  # too short to skip anything
    assert _ragged_block(321) is None  # indivisible -> legacy kernel


def test_ragged_choice_forced_by_vmem():
    """Long caches MUST take the blocked kernel: the full-read kernel loads a
    sample's whole K+V per grid cell and Mosaic refuses past ~16 MB scoped
    vmem (measured on-chip at S=2048 bf16: 64 MB). Env opt-out cannot
    override a lowering impossibility."""
    import pytest

    from mmmm_tpu.ops.decode_kernel import _ragged_choice

    h, d = 32, 128
    serving = 2 * h * 320 * d * 2  # 5.2 MB: fits, default-gated
    assert _ragged_choice(320, serving, default=False) is None
    long = 2 * h * 2048 * d * 2  # 67 MB: cannot lower, forced ragged
    assert _ragged_choice(2048, long, default=False) == 128
    # forced but indivisible cache length -> actionable error, not Mosaic OOM
    with pytest.raises(ValueError, match="multiple of 8"):
        _ragged_choice(2049, 2 * h * 2049 * d * 2, default=False)


def test_ragged_choice_defaults_and_env(monkeypatch):
    """Both dtypes default ragged OFF at serving lengths (end-to-end B28
    sweep 2026-08-18: full read 11.91 vs ragged 11.72 rep/s); the env
    overrides both directions, and VMEM overflow still forces ragged."""
    from mmmm_tpu.ops.decode_kernel import _ragged_choice

    monkeypatch.delenv("MMMM_RAGGED_DECODE", raising=False)
    assert _ragged_choice(320, 1 << 20, default=True) == 64
    assert _ragged_choice(320, 1 << 20, default=False) is None
    monkeypatch.setenv("MMMM_RAGGED_DECODE", "1")
    assert _ragged_choice(320, 1 << 20, default=False) == 64
    monkeypatch.setenv("MMMM_RAGGED_DECODE", "0")
    assert _ragged_choice(320, 1 << 20, default=True) is None


def test_kv_append_fallback_matches_dus():
    """kv_append_pallas CPU fallback == vmapped dynamic_update_slice (an
    unaligned Smax takes the same fallback on TPU; the on-chip
    micro/integration gate is scripts/verify_kv_append.py — ran 2026-08-19,
    tokens bit-identical with MMMM_KV_APPEND=0/1)."""
    from mmmm_tpu.ops.decode_kernel import kv_append_pallas

    rng = np.random.default_rng(3)
    b, h, smax, d = 3, 4, 16, 8
    kc = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.bfloat16)
    widx = jnp.asarray([0, 7, 15], jnp.int32)
    upd = jax.vmap(
        lambda c, u, i: jax.lax.dynamic_update_slice_in_dim(c, u, i, axis=1)
    )
    gk, gv = kv_append_pallas(kc, vc, kn, vn, widx)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(upd(kc, kn, widx)))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(upd(vc, vn, widx)))


def test_kv_append_q8_fallback_matches_dus():
    """q8 kv_append CPU fallback (and the odd-Smax graceful fallback) ==
    vmapped DUS on all four quantized-cache leaves. On-chip gate:
    scripts/verify_kv_append.py sections 3-4."""
    from mmmm_tpu.ops.decode_kernel import kv_append_pallas_q8
    from mmmm_tpu.ops.quant import quantize_kv

    rng = np.random.default_rng(5)
    b, h, smax, d = 3, 4, 40, 8  # 40 % 32 != 0: exercises the fallback guard
    kq, ks = quantize_kv(jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.bfloat16))
    vq, vs = quantize_kv(jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.bfloat16))
    kqn, ksn = quantize_kv(jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.bfloat16))
    vqn, vsn = quantize_kv(jnp.asarray(rng.normal(size=(b, h, 1, d)), jnp.bfloat16))
    widx = jnp.asarray([0, 17, 39], jnp.int32)
    got = kv_append_pallas_q8(
        {"kq": kq, "ks": ks, "vq": vq, "vs": vs}, kqn, ksn, vqn, vsn, widx
    )
    upd = jax.vmap(
        lambda c, u, i: jax.lax.dynamic_update_slice_in_dim(c, u, i, axis=1)
    )
    ref = {"kq": upd(kq, kqn, widx), "ks": upd(ks, ksn, widx),
           "vq": upd(vq, vqn, widx), "vs": upd(vs, vsn, widx)}
    for key in ("kq", "ks", "vq", "vs"):
        np.testing.assert_array_equal(np.asarray(got[key]), np.asarray(ref[key]))


def test_kv_append_multi_interpret_matches_dus():
    """K-row spec-window append kernel (interpret semantics) == vmapped DUS,
    covering both the no-spill case (t%8 + K <= 8) and the two-block spill;
    the on-chip gate is scripts/verify_spec_kernels.py."""
    from mmmm_tpu.ops.decode_kernel import kv_append_pallas_multi

    rng = np.random.default_rng(5)
    b, h, smax, d, k = 3, 2, 48, 128, 6
    kc = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(b, h, k, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(b, h, k, d)), jnp.bfloat16)
    # row 0: aligned (no spill), row 1: spill across the 8-boundary,
    # row 2: window ending exactly at smax (last block, spill)
    widx = jnp.asarray([8, 13, smax - k], jnp.int32)
    upd = jax.vmap(
        lambda c, u, i: jax.lax.dynamic_update_slice_in_dim(c, u, i, axis=1)
    )
    want_k, want_v = upd(kc, kn, widx), upd(vc, vn, widx)
    got_k, got_v = kv_append_pallas_multi(kc, vc, kn, vn, widx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_decode_window_kernel_matches_bhsd():
    """Spec verify-window attention kernel == the XLA bhsd path under the
    affine kv_len contract (position j sees slots < write + j + 1)."""
    from mmmm_tpu.models.cogvlm.decoder import decode_attention_bhsd
    from mmmm_tpu.ops.decode_kernel import decode_attention_pallas_window

    rng = np.random.default_rng(7)
    b, nq, h, smax, d = 2, 8, 4, 64, 128
    q = jnp.asarray(rng.normal(size=(b, nq, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.bfloat16)
    widx = jnp.asarray([10, 37], jnp.int32)
    out = decode_attention_pallas_window(q, kc, vc, widx)
    kv_len = widx[:, None] + jnp.arange(1, nq + 1)[None, :]  # (B, K)
    valid = jnp.arange(smax)[None, :] < kv_len[..., None]
    want = decode_attention_bhsd(q, kc, vc, valid)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_decode_window_kernel_vmem_fallback():
    from mmmm_tpu.ops.decode_kernel import decode_attention_pallas_window

    q = jnp.zeros((1, 8, 32, 128), jnp.bfloat16)
    big = jnp.zeros((1, 32, 4096, 128), jnp.bfloat16)  # 64 MB K+V > VMEM
    assert decode_attention_pallas_window(q, big, big, jnp.zeros((1,), jnp.int32)) is None


def test_dense_bshd_layout_variant_matches(monkeypatch):
    """MMMM_DENSE_BSHD=1 routes dense_attention through the layout-native
    (B,S,H,D) kernel — results must match the bhsd-layout path (interpret
    mode; on-chip A/B is PROBE_VITATTN_r05 / queue C)."""
    from mmmm_tpu.ops.dense_attn import dense_attention, fits_dense_bshd

    rng = np.random.default_rng(9)
    b, s, h, d = 2, 200, 16, 88
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    scale = d ** -0.5
    assert fits_dense_bshd(s, h, d)
    monkeypatch.delenv("MMMM_DENSE_BSHD", raising=False)
    base = dense_attention(q, k, v, scale)
    monkeypatch.setenv("MMMM_DENSE_BSHD", "1")
    bshd = dense_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(bshd, np.float32), np.asarray(base, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_dense_fast_softmax_matches(monkeypatch):
    """MMMM_DENSE_FAST_SOFTMAX=1 (bf16 exp + post-matmul normalization) must
    track the f32 softmax within bf16 output tolerance on both layouts."""
    from mmmm_tpu.ops.dense_attn import dense_attention

    rng = np.random.default_rng(13)
    b, s, h, d = 2, 200, 16, 88
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
               for _ in range(3))
    scale = d ** -0.5
    monkeypatch.delenv("MMMM_DENSE_FAST_SOFTMAX", raising=False)
    base = dense_attention(q, k, v, scale)
    monkeypatch.setenv("MMMM_DENSE_FAST_SOFTMAX", "1")
    for layout in ("0", "1"):
        monkeypatch.setenv("MMMM_DENSE_BSHD", layout)
        fast = dense_attention(q, k, v, scale)
        np.testing.assert_allclose(
            np.asarray(fast, np.float32), np.asarray(base, np.float32),
            rtol=0.05, atol=0.05,
        )
