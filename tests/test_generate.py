"""Greedy generation tests: decode loop == naive full-forward re-encoding."""
import jax
import jax.numpy as jnp
import numpy as np

from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.models.cogvlm import cogvlm_forward
from mmmm_tpu.models.generate import greedy_generate


def _naive_greedy(params, cfg, ids, tt, pos, max_new, eos, bop, eop, image, patch, pool):
    """Re-encode the full sequence every step (the reference no-cache path),
    applying the <p>/</p> position-freeze rule."""
    ids, tt, pos = np.asarray(ids)[0], np.asarray(tt)[0], np.asarray(pos)[0]
    out = []
    for _ in range(max_new):
        seg = np.ones((1, len(ids)), np.int32)
        _, logits = cogvlm_forward(
            params, cfg, jnp.asarray(ids)[None], jnp.asarray(tt)[None],
            jnp.asarray(pos)[None], jnp.asarray(seg), image, patch, pool, attn_impl="xla",
        )
        nxt = int(np.argmax(np.asarray(logits)[0, -1]))
        out.append(nxt)
        if nxt == eos:
            break
        keep = (ids[-1] == bop) | (nxt == eop)
        ids = np.append(ids, nxt)
        tt = np.append(tt, 0)
        pos = np.append(pos, pos[-1] + 1 - int(keep))
    return out


def test_greedy_generate_matches_naive():
    cfg = MMMMConfig.tiny().vlm
    model_params = MMMMModel(MMMMConfig.tiny()).init(jax.random.PRNGKey(3))["cogvlm"]
    b, s = 1, 20
    n_vis = 10
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + n_vis].set(1)
    pos = jnp.concatenate(
        [jnp.asarray([[0, 1]]), jnp.full((1, n_vis - 2), 2), jnp.asarray([[3, 4]]),
         5 + jnp.arange(s - n_vis - 2)[None]], axis=1,
    ).astype(jnp.int32)
    image = jnp.ones((b, 3, 4, 16, 16), jnp.float32)
    patch, pool = (2, 4, 4), (1, 2, 2)
    max_new = 8

    # first pass to discover which tokens this random model likes to emit,
    # then declare two of them bop/eop so the freeze rule is actually exercised
    res0 = greedy_generate(
        model_params, cfg, ids, tt, pos, jnp.asarray([s]),
        max_new_tokens=max_new, eos_token_id=2, bop_token_id=-1, eop_token_id=-1,
        image=image, patch_size=patch, pool_size=pool, attn_impl="xla",
    )
    emitted = [int(t) for t in np.asarray(res0.tokens)[0]]
    bop = emitted[1] if len(set(emitted)) > 1 else 99
    eop = emitted[3] if len(emitted) > 3 else 98

    res = greedy_generate(
        model_params, cfg, ids, tt, pos, jnp.asarray([s]),
        max_new_tokens=max_new, eos_token_id=2, bop_token_id=bop, eop_token_id=eop,
        image=image, patch_size=patch, pool_size=pool, attn_impl="xla",
    )
    naive = _naive_greedy(
        model_params, cfg, ids, tt, pos, max_new, 2, bop, eop, image, patch, pool
    )
    got = [int(t) for t in np.asarray(res.tokens)[0][: len(naive)]]
    assert got == naive, f"decode {got} != full-forward {naive}"


def test_decode_unroll_token_identical(monkeypatch):
    """MMMM_DECODE_UNROLL only changes scan codegen, never tokens or hidden."""
    cfg = MMMMConfig.tiny().vlm
    params = MMMMModel(MMMMConfig.tiny()).init(jax.random.PRNGKey(5))["cogvlm"]
    rng = np.random.default_rng(2)
    b, s, max_new = 2, 12, 7  # 7 % 2 != 0: exercises the unroll remainder
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s)).astype(jnp.int32)

    def run():
        return greedy_generate(
            params, cfg, ids, tt, pos, jnp.full((b,), s, jnp.int32),
            max_new_tokens=max_new, eos_token_id=2, bop_token_id=-1,
            eop_token_id=-1, attn_impl="xla",
        )

    base = run()
    monkeypatch.setenv("MMMM_DECODE_UNROLL", "2")
    unrolled = run()
    np.testing.assert_array_equal(np.asarray(base.tokens), np.asarray(unrolled.tokens))
    np.testing.assert_array_equal(
        np.asarray(base.hidden), np.asarray(unrolled.hidden)
    )


def test_generate_ragged_batch_padding():
    """Two prompts of different lengths in one padded batch decode like solo runs."""
    cfg = MMMMConfig.tiny().vlm
    params = MMMMModel(MMMMConfig.tiny()).init(jax.random.PRNGKey(4))["cogvlm"]
    rng = np.random.default_rng(1)
    s_bucket, max_new = 16, 5
    lens = [16, 11]
    ids = np.zeros((2, s_bucket), np.int32)
    for i, ln in enumerate(lens):
        ids[i, :ln] = rng.integers(4, cfg.vocab_size, size=ln)
    tt = np.zeros((2, s_bucket), np.int32)
    pos = np.broadcast_to(np.arange(s_bucket), (2, s_bucket)).copy()
    res = greedy_generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(pos),
        jnp.asarray(lens), max_new_tokens=max_new, eos_token_id=2,
        bop_token_id=-1, eop_token_id=-1, attn_impl="xla",
    )
    for i, ln in enumerate(lens):
        solo = greedy_generate(
            params, cfg, jnp.asarray(ids[i : i + 1, :ln]), jnp.asarray(tt[i : i + 1, :ln]),
            jnp.asarray(pos[i : i + 1, :ln]), jnp.asarray([ln]), max_new_tokens=max_new,
            eos_token_id=2, bop_token_id=-1, eop_token_id=-1, attn_impl="xla",
        )
        np.testing.assert_array_equal(
            np.asarray(res.tokens)[i], np.asarray(solo.tokens)[0],
            err_msg=f"sample {i} batch != solo",
        )
