"""HF fast-tokenizer backend test (built in-memory; no network/model files)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def hf_tok():
    """A tiny word-level HF fast tokenizer constructed programmatically."""
    try:
        from tokenizers import Tokenizer
        from tokenizers.models import WordLevel
        from tokenizers.pre_tokenizers import Whitespace
        from transformers import PreTrainedTokenizerFast
    except ImportError:
        pytest.skip("tokenizers/transformers unavailable")
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    for i, w in enumerate(
        "the heart is normal lungs are clear a nodule seen no effusion".split(), start=4
    ):
        vocab[w] = i
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<s>", eos_token="</s>", unk_token="<unk>"
    )
    return fast


def test_hf_backend_wraps_and_grounds(hf_tok):
    from mmmm_tpu.data.tokenizer import SPECIAL_TOKENS, MMMMTokenizer, _HFBackend

    hf_tok.add_tokens(list(SPECIAL_TOKENS), special_tokens=True)
    special_map = {t: hf_tok.convert_tokens_to_ids(t) for t in SPECIAL_TOKENS}
    mt = MMMMTokenizer(_HFBackend(hf_tok), special_map)

    ids = mt.encode("the heart is <p> normal</p> no effusion")
    assert mt.bop_token_id in ids and mt.eop_token_id in ids
    [targets] = mt.parse_targets(np.asarray([ids]))
    assert targets == ["normal"]

    # layout build works through the HF backend too
    from mmmm_tpu.data import ConvTurn
    from mmmm_tpu.data.input_builder import prepare_vlm_inputs

    inputs, _ = prepare_vlm_inputs(
        [ConvTurn("the lungs are clear", "no effusion seen")], mt, 4,
        inference=False, grounding=False,
    )
    assert inputs.input_ids[0] == mt.bos_token_id
    assert (inputs.labels[inputs.labels != -100] >= 0).all()
