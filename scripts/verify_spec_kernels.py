"""On-chip verification of the speculative verify-window kernels (round 5).

1. micro: ``kv_append_pallas_multi`` == vmapped dynamic_update_slice for
   no-spill / spill / end-of-cache windows at serving rows (H=32, D=128).
2. micro: ``decode_attention_pallas_window`` == the XLA bhsd path under the
   affine verify mask (position j sees slots < write + j + 1).
3. integration: speculative generate tokens bit-identical to greedy with
   MMMM_SPEC_KERNEL=0 (XLA verify path) and =1 (window kernels) on a small
   head-dim-128 config, ragged prompts.
4. timing: verify-step ms A/B (kernels vs XLA path) at the serving shape —
   B48 H32 S=328 D=128, k=8 window, one layer scanned x14; prints both.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices())

from mmmm_tpu.ops.decode_kernel import (
    decode_attention_pallas_window,
    kv_append_pallas_multi,
)

rng = np.random.default_rng(0)

# ---- 1. multi-append micro --------------------------------------------------
b, h, smax, d, k = 5, 32, 64, 128, 8
kc = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.bfloat16)
vc = jnp.asarray(rng.normal(size=(b, h, smax, d)), jnp.bfloat16)
kn = jnp.asarray(rng.normal(size=(b, h, k, d)), jnp.bfloat16)
vn = jnp.asarray(rng.normal(size=(b, h, k, d)), jnp.bfloat16)
# no-spill (0, 8), spill (3, 13), end-of-cache (56)
widx = jnp.asarray([0, 8, 3, 13, smax - k], jnp.int32)
upd = jax.vmap(lambda c, u, i: jax.lax.dynamic_update_slice_in_dim(c, u, i, axis=1))
ref_k, ref_v = np.asarray(upd(kc, kn, widx)), np.asarray(upd(vc, vn, widx))
got_k, got_v = jax.jit(kv_append_pallas_multi)(kc, vc, kn, vn, widx)
np.testing.assert_array_equal(np.asarray(got_k), ref_k)
np.testing.assert_array_equal(np.asarray(got_v), ref_v)
print("MULTI-APPEND MICRO OK")

# ---- 2. window attention micro ----------------------------------------------
from mmmm_tpu.models.cogvlm.decoder import decode_attention_bhsd

q = jnp.asarray(rng.normal(size=(b, k, h, d)), jnp.bfloat16)
out = jax.jit(decode_attention_pallas_window)(q, got_k, got_v, widx)
kv_len = widx[:, None] + jnp.arange(1, k + 1)[None, :]
valid = jnp.arange(smax)[None, :] < kv_len[..., None]
want = decode_attention_bhsd(q, got_k, got_v, valid)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - want.astype(jnp.float32))))
print(f"WINDOW ATTN max_abs_err vs bhsd: {err:.5f}")
assert err < 0.05, err

# ---- 3. integration ---------------------------------------------------------
from mmmm_tpu.models.cogvlm import CogVLMConfig
from mmmm_tpu.models.cogvlm.model import init_cogvlm_params
from mmmm_tpu.models.generate import greedy_generate
from mmmm_tpu.models.speculate import ngram_speculative_generate

cfg = CogVLMConfig(
    vocab_size=256, hidden_size=512, intermediate_size=1024,
    num_hidden_layers=2, num_attention_heads=4,
    vision=CogVLMConfig.tiny().vision,
)
params = init_cogvlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
bb, s, max_new = 3, 24, 16
ids = jnp.asarray(rng.integers(4, cfg.vocab_size, size=(bb, s)), jnp.int32)
tt = jnp.zeros((bb, s), jnp.int32)
pos = jnp.broadcast_to(jnp.arange(s)[None], (bb, s)).astype(jnp.int32)
plen = jnp.asarray([24, 17, 20], jnp.int32)
kw = dict(max_new_tokens=max_new, eos_token_id=2, bop_token_id=-1,
          eop_token_id=-1, attn_impl="auto")

greedy_toks = np.asarray(
    greedy_generate(params, cfg, ids, tt, pos, plen, **kw).tokens
)
for flag in ("0", "1"):
    os.environ["MMMM_SPEC_KERNEL"] = flag
    spec_toks = np.asarray(
        ngram_speculative_generate(
            params, cfg, ids, tt, pos, plen, draft_len=7, **kw
        ).tokens
    )
    np.testing.assert_array_equal(greedy_toks, spec_toks)
    print(f"INTEGRATION OK: MMMM_SPEC_KERNEL={flag} tokens == greedy")

# ---- 4. verify-step timing A/B ---------------------------------------------
from jax import lax

B, H, S, D, K, LAYERS = 48, 32, 328, 128, 8, 14
kcB = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
vcB = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
qB = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.bfloat16)
knB = jnp.asarray(rng.normal(size=(B, H, K, D)), jnp.bfloat16)
vnB = jnp.asarray(rng.normal(size=(B, H, K, D)), jnp.bfloat16)
wB = jnp.asarray(rng.integers(190, 300, size=(B,)), jnp.int32)


# per-call relay dispatch+fetch costs ~25-30 ms and swamps a single
# 14-layer pass (the first r5 gate read "46 GB/s" through that intercept) —
# time at two scan lengths and report the SLOPE.
def make_kernel_step(L):
    def f(kc, vc, q, kn, vn, w):
        kv_len = w[:, None] + jnp.arange(1, K + 1)[None, :]
        valid = jnp.arange(S)[None, :] < kv_len[..., None]

        def body(carry, _):
            kc, vc = carry
            kc, vc = kv_append_pallas_multi(kc, vc, kn, vn, w)
            # winning r5 combo: in-place append + XLA bhsd windowed read
            ctx = decode_attention_bhsd(q, kc, vc, valid)
            return (kc, vc), jnp.sum(ctx.astype(jnp.float32))
        (_, _), outs = lax.scan(body, (kc, vc), None, length=L)
        return jnp.sum(outs)
    return f


def make_xla_step(L):
    def f(kc, vc, q, kn, vn, w):
        kv_len = w[:, None] + jnp.arange(1, K + 1)[None, :]

        def body(carry, _):
            kc, vc = carry
            kc = upd(kc, kn, w)
            vc = upd(vc, vn, w)
            valid = jnp.arange(S)[None, :] < kv_len[..., None]
            ctx = decode_attention_bhsd(q, kc, vc, valid)
            return (kc, vc), jnp.sum(ctx.astype(jnp.float32))
        (_, _), outs = lax.scan(body, (kc, vc), None, length=L)
        return jnp.sum(outs)
    return f


gb_layer = 2 * B * H * S * D * 2 / 1e9
for name, mk in (("kernel-append+xla", make_kernel_step),
                 ("dus-append+xla", make_xla_step)):
    ms = {}
    for L in (LAYERS, 4 * LAYERS):
        jf = jax.jit(mk(L))
        np.asarray(jf(kcB, vcB, qB, knB, vnB, wB))  # compile + warm
        t0 = time.time()
        for _ in range(8):
            np.asarray(jf(kcB, vcB, qB, knB, vnB, wB))
        ms[L] = (time.time() - t0) / 8
    slope = (ms[4 * LAYERS] - ms[LAYERS]) / (3 * LAYERS)
    print(f"TIMING {name}: {slope*1e3:.3f} ms/layer "
          f"({gb_layer/slope:.0f} GB/s effective cache read)")
print("ALL OK")
