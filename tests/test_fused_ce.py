"""Fused blockwise CE == dense weighted CE, values and gradients
(ref semantics ``modeling_cogvlm.py:610-627``)."""
import jax
import jax.numpy as jnp
import numpy as np

from mmmm_tpu.models.cogvlm.model import weighted_ce_loss
from mmmm_tpu.ops.fused_ce import fused_ce, fused_weighted_ce_loss


def _data(b=2, s=16, c=24, v=97, seed=0):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32)
    lm_head = jnp.asarray(rng.normal(size=(c, v)) * 0.1, jnp.float32)
    labels = rng.integers(0, v, size=(b, s))
    labels[0, :3] = -100  # ignored prefix
    weight = rng.uniform(0.5, 2.0, size=(b, s)).astype(np.float32)
    return hidden, lm_head, jnp.asarray(labels), jnp.asarray(weight)


def test_fused_matches_dense_loss():
    hidden, lm_head, labels, weight = _data()
    logits = jnp.einsum("bsc,cv->bsv", hidden, lm_head).astype(jnp.float32)
    want = weighted_ce_loss(logits, labels, weight)
    # block_v that does NOT divide V exercises the ragged-tail masking
    got = fused_weighted_ce_loss(hidden, lm_head, labels, weight, block_v=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    got_nw = fused_weighted_ce_loss(hidden, lm_head, labels, block_v=64)
    want_nw = weighted_ce_loss(logits, labels)
    np.testing.assert_allclose(np.asarray(got_nw), np.asarray(want_nw), rtol=1e-5)


def test_fused_gradients_match_dense():
    hidden, lm_head, labels, weight = _data(seed=1)

    def dense(h, w):
        logits = jnp.einsum("bsc,cv->bsv", h, w).astype(jnp.float32)
        return weighted_ce_loss(logits, labels, weight)

    def fused(h, w):
        return fused_weighted_ce_loss(h, w, labels, weight, block_v=32)

    ld, (gh_d, gw_d) = jax.value_and_grad(dense, argnums=(0, 1))(hidden, lm_head)
    lf, (gh_f, gw_f) = jax.value_and_grad(fused, argnums=(0, 1))(hidden, lm_head)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(ld), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gh_f), np.asarray(gh_d), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_d), rtol=1e-4, atol=1e-6)


def test_fused_ce_per_token_values():
    rng = np.random.default_rng(2)
    t, c, v = 8, 12, 33
    hidden = jnp.asarray(rng.normal(size=(t, c)), jnp.float32)
    lm_head = jnp.asarray(rng.normal(size=(c, v)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(t,)))
    ce = jax.jit(lambda h: fused_ce(h, lm_head, labels, 16))(hidden)
    logits = np.asarray(hidden @ lm_head, np.float64)
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
    want = lse - logits[np.arange(t), np.asarray(labels)]
    np.testing.assert_allclose(np.asarray(ce), want, rtol=1e-5)


def test_bf16_hidden_supported():
    hidden, lm_head, labels, weight = _data(seed=3)
    got = fused_weighted_ce_loss(
        hidden.astype(jnp.bfloat16), lm_head.astype(jnp.bfloat16), labels, weight,
        block_v=32,
    )
    logits = jnp.einsum(
        "bsc,cv->bsv", hidden.astype(jnp.bfloat16), lm_head.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    want = weighted_ce_loss(logits, labels, weight)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2)
