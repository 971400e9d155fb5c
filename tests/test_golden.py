"""Golden-value regression tests: pin tiny-model outputs across refactors.

The reference ships no tests; its de-facto regression signal is eval suites
run on GPUs. Here, deterministic fixtures pin the forward/generation outputs
of a fixed-seed tiny model so any refactor of kernels/model code that changes
numerics is caught immediately (regenerate with --regen when an intentional
change lands).
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.models.cogvlm import cogvlm_forward
from mmmm_tpu.models.generate import greedy_generate

FIXTURE = Path(__file__).parent / "fixtures" / "golden_tiny.npz"


def _compute():
    cfg = MMMMConfig.tiny()
    params = MMMMModel(cfg).init(jax.random.PRNGKey(1234))
    b, s, n_vis = 1, 24, 10
    rng = np.random.default_rng(99)
    ids = jnp.asarray(rng.integers(4, cfg.vlm.vocab_size, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + n_vis].set(1)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    seg = jnp.ones((b, s), jnp.int32)
    img = jnp.asarray(rng.normal(size=(b, 3, 4, 16, 16)), jnp.float32)
    hidden, logits = cogvlm_forward(
        params["cogvlm"], cfg.vlm, ids, tt, pos, seg, img, (2, 4, 4), (1, 2, 2), attn_impl="xla"
    )
    res = greedy_generate(
        params["cogvlm"], cfg.vlm, ids, tt, pos, jnp.asarray([s]),
        max_new_tokens=8, eos_token_id=2, bop_token_id=-1, eop_token_id=-1,
        image=img, patch_size=(2, 4, 4), pool_size=(1, 2, 2), attn_impl="xla",
    )
    return {
        "logits_slice": np.asarray(logits[0, -4:, :8]),
        "hidden_norm": np.asarray(jnp.linalg.norm(hidden, axis=-1)[0]),
        "tokens": np.asarray(res.tokens[0]),
    }


def test_golden_tiny_outputs():
    got = _compute()
    if not FIXTURE.exists():
        FIXTURE.parent.mkdir(exist_ok=True)
        np.savez(FIXTURE, **got)
        pytest.skip("golden fixture created; rerun to compare")
    ref = np.load(FIXTURE)
    np.testing.assert_array_equal(got["tokens"], ref["tokens"], err_msg="greedy tokens changed")
    np.testing.assert_allclose(got["logits_slice"], ref["logits_slice"], atol=1e-4)
    np.testing.assert_allclose(got["hidden_norm"], ref["hidden_norm"], atol=1e-3)
