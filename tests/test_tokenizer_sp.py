"""Sentencepiece-semantics tokenizer conformance + greedy-decode determinism.

The reference tokenizer is vicuna-7B LlamaTokenizer (sentencepiece) + 8
specials (``mmmm/tokenizer.py:10-89``). The `sentencepiece` lib is not in the
image, so the fixture builds a faithful SP-style tokenizer with the HF
``tokenizers`` runtime — the exact pipeline `LlamaTokenizerFast` uses for
legacy=False conversions: Unigram model with byte fallback, Metaspace
pre-tokenizer (``▁``, prepend_scheme="first"), SP decoder chain
(Replace/ByteFallback/Fuse/Strip). This pins the three behaviors where
token-identical generation dies: dummy-prefix spaces, special-token
splitting, and byte fallback.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.data import MMMMTokenizer


@pytest.fixture(scope="module")
def sp_dir(tmp_path_factory):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    pieces = [("<unk>", 0.0), ("<s>", 0.0), ("</s>", 0.0)]
    pieces += [(f"<0x{b:02X}>", -20.0) for b in range(256)]
    words = [
        "▁the", "▁liver", "▁is", "▁a", "▁nodule", "▁in", "▁left", "▁lung",
        "▁no", "▁and", "▁there", "▁seen", "▁right", "liver", "lung", "nod",
        "ule", "▁", "s", "e", "t", ".", "▁Results", ":", "▁spleen",
    ]
    pieces += [(w, -float(i + 1)) for i, w in enumerate(words)]
    tok = Tokenizer(models.Unigram(pieces, unk_id=0, byte_fallback=True))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="first", split=False
    )
    tok.decoder = decoders.Sequence([
        decoders.Replace("▁", " "), decoders.ByteFallback(),
        decoders.Fuse(), decoders.Strip(" ", 1, 0),
    ])
    hf = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>", pad_token="<unk>",
    )
    d = tmp_path_factory.mktemp("sp_tok")
    hf.save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def sp_tok(sp_dir):
    return MMMMTokenizer.from_pretrained(str(sp_dir))


def _tokens(tok: MMMMTokenizer, text: str) -> list[str]:
    return tok.backend.tok.convert_ids_to_tokens(tok.encode(text))


def test_specials_are_atomic_single_ids(sp_tok):
    ids = sp_tok.encode("<p> liver</p>")
    assert ids[0] == sp_tok.bop_token_id and ids[-1] == sp_tok.eop_token_id
    assert len(ids) == 3  # the phrase is ONE sp piece: "▁liver"
    for t in ("<sys>", "<usr>", "<grd>", "<ngrd>", "<np>", "</np>"):
        assert len(sp_tok.encode(t)) == 1


def test_dummy_prefix_space_semantics(sp_tok):
    """SP quirks the HF backend must reproduce exactly:
    - sequence start gets the dummy prefix: "the liver" -> [▁the, ▁liver];
    - the space inside "<p> liver</p>" folds INTO the piece (▁liver), it does
      not produce a stray ▁ — a per-segment re-encode would emit [▁, ▁liver]
      (prefix applied again), the classic token-identity killer."""
    assert _tokens(sp_tok, "the liver is seen") == ["▁the", "▁liver", "▁is", "▁seen"]
    assert _tokens(sp_tok, "<p> liver</p>") == ["<p>", "▁liver", "</p>"]
    # mid-sentence special: "and <p> left lung</p>" keeps the explicit space
    # BEFORE the tag as its own piece and folds the one after the tag
    assert _tokens(sp_tok, "and <p> left lung</p>") == [
        "▁and", "▁", "<p>", "▁left", "▁lung", "</p>",
    ]
    # backend-native path is what MMMMTokenizer.encode actually uses
    raw = sp_tok.backend.tok.encode("and <p> left lung</p>", add_special_tokens=False)
    assert sp_tok.encode("and <p> left lung</p>") == raw


def test_byte_fallback_roundtrip(sp_tok):
    ids = sp_tok.encode("📎")
    toks = sp_tok.backend.tok.convert_ids_to_tokens(ids)
    assert toks[-4:] == ["<0xF0>", "<0x9F>", "<0x93>", "<0x8E>"]  # utf-8 bytes
    assert sp_tok.decode(ids).strip() == "📎"


def test_parse_targets_sp_backend(sp_tok):
    text = "there is <p> liver</p> and <p> left lung</p>."
    ids = sp_tok.encode(text)
    out = sp_tok.parse_targets(np.asarray([ids]))
    assert out == [["liver", "left lung"]]
    # malformed nesting -> None (mmmm/tokenizer.py:58-65)
    bad = [sp_tok.bop_token_id, sp_tok.bop_token_id, sp_tok.eop_token_id]
    assert sp_tok.parse_targets(np.asarray([bad])) == [None]


def test_wrap_name_roundtrip(sp_tok):
    ids = sp_tok.encode("Results: " + sp_tok.wrap_name("liver", True))
    out = sp_tok.parse_targets(np.asarray([ids]))
    assert out == [["liver"]]
    ids = sp_tok.encode(sp_tok.wrap_name("spleen", False))
    assert ids[0] == sp_tok.bonp_token_id and ids[-1] == sp_tok.eonp_token_id


def test_greedy_tie_break_is_lowest_index_and_deterministic():
    """fp32 logits with exact ties must decode to the LOWEST token id, run
    after run (ROADMAP decode-determinism risk): zero the lm_head so every
    step is a perfect |V|-way tie, then drive the REAL decode loop."""
    from mmmm_tpu.models import MMMMConfig, MMMMModel
    from mmmm_tpu.models.generate import greedy_generate

    cfg = MMMMConfig.tiny().vlm
    params = MMMMModel(MMMMConfig.tiny()).init(jax.random.PRNGKey(0))["cogvlm"]
    params["llm"]["lm_head"] = jnp.zeros_like(params["llm"]["lm_head"])
    b, s, n_vis = 1, 16, 6
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + n_vis].set(1)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s)).astype(jnp.int32)
    runs = []
    for _ in range(2):
        res = greedy_generate(
            params, cfg, ids, tt, pos, jnp.asarray([s]),
            max_new_tokens=4, eos_token_id=-1, bop_token_id=-2, eop_token_id=-3,
            image=jnp.ones((b, 3, 4, 16, 16), jnp.float32),
            patch_size=(2, 4, 4), pool_size=(1, 2, 2), attn_impl="xla",
        )
        runs.append(np.asarray(res.tokens))
    np.testing.assert_array_equal(runs[0], runs[1])
    np.testing.assert_array_equal(runs[0], 0)  # tie -> token id 0, every step
