"""Tokenizer + prepare_vlm_inputs layout tests (parity with mmmm/data/utils.py)."""
import numpy as np
import pytest

from mmmm_tpu.data import CE_IGNORE_INDEX, ConvTurn, MMMMTokenizer, prepare_vlm_inputs
from mmmm_tpu.data.input_builder import extract_vg_positions, pad_to


@pytest.fixture(scope="module")
def tok():
    return MMMMTokenizer.byte_fallback()


def test_tokenizer_specials_roundtrip(tok):
    text = "<usr> find the <p> heart</p> now<sys>"
    ids = tok.encode(text)
    assert tok.usr_token_id == ids[0]
    assert tok.bop_token_id in ids and tok.eop_token_id in ids
    assert tok.decode(ids) == text


def test_parse_targets(tok):
    ids = tok.encode("report: <p> left lung</p> and <p> heart</p> ok")
    [targets] = tok.parse_targets(np.asarray([ids]))
    assert targets == ["left lung", "heart"]
    # malformed nesting -> None
    bad = [tok.bop_token_id, tok.bop_token_id, tok.eop_token_id]
    assert tok.parse_targets(np.asarray([bad])) == [None]


def test_layout_and_positions(tok):
    conv = [ConvTurn("what is this", "a chest x-ray")]
    n_img = 8
    inputs, _ = prepare_vlm_inputs(
        conv, tok, n_img, inference=False, grounding=False, bop_weight=None
    )
    ids, tt, pos = inputs.input_ids, inputs.token_type_ids, inputs.position_ids
    # layout: bos, boi, 8 patches, eoi, ngrd, text...
    assert ids[0] == tok.bos_token_id
    assert (ids[1 : 1 + n_img + 2] == 0).all()
    assert ids[n_img + 3] == tok.ngrd_token_id
    # token types: vision covers boi..eoi (n_img + 2 tokens)
    assert tt[0] == 0 and (tt[1 : n_img + 3] == 1).all() and (tt[n_img + 3 :] == 0).all()
    # positions: 0, 1, 2 x n_img, 3, 4, then 5, 6, ...
    np.testing.assert_array_equal(pos[: n_img + 4], [0, 1] + [2] * n_img + [3, 4])
    assert pos[n_img + 4] == 5 and pos[n_img + 5] == 6
    # labels: prompt ignored, answer supervised, shifted by one
    labels = inputs.labels
    assert (labels[: n_img + 4] == CE_IGNORE_INDEX).all()
    answer_ids = tok.encode("a chest x-ray")
    sup = labels[labels != CE_IGNORE_INDEX]
    np.testing.assert_array_equal(sup, answer_ids + [tok.eos_token_id])
    # shifted: label at t predicts input at t+1
    t = np.nonzero(labels == answer_ids[0])[0][0]
    assert inputs.input_ids[t + 1] == answer_ids[0]


def test_grounded_positions_freeze(tok):
    """Tokens inside <p>...</p>: position frozen after <p> and at </p>."""
    conv = [ConvTurn("find", "see <p> x</p> done")]
    inputs, _ = prepare_vlm_inputs(
        conv, tok, 4, inference=False, grounding=True, bop_weight=5.0
    )
    ids, pos = inputs.input_ids, inputs.position_ids
    assert ids[4 + 3] == tok.grd_token_id
    bop_idx = np.nonzero(ids == tok.bop_token_id)[0][0]
    eop_idx = np.nonzero(ids == tok.eop_token_id)[0][0]
    # token right after <p> keeps <p>'s position; </p> keeps previous position
    assert pos[bop_idx + 1] == pos[bop_idx]
    assert pos[eop_idx] == pos[eop_idx - 1]
    # bop weight applied at the label predicting <p>
    w = inputs.weight
    assert w[bop_idx - 1] == 5.0


def test_negative_phrase_rewrite(tok):
    """<np>...</np> becomes <p>...</p> in inputs; labels skip the grounded open."""
    conv = [ConvTurn("find", "no <np> tumor</np> seen")]
    inputs, _ = prepare_vlm_inputs(
        conv, tok, 4, inference=False, grounding=True, bop_weight=5.0
    )
    ids = inputs.input_ids
    assert tok.bonp_token_id not in ids and tok.eonp_token_id not in ids
    assert tok.bop_token_id in ids and tok.eop_token_id in ids
    bop_idx = np.nonzero(ids == tok.bop_token_id)[0][0]
    # label before the converted <np> must NOT be <p> (predict next real token)
    assert inputs.labels[bop_idx - 1] != tok.bop_token_id
    # label before the converted </np> IS </p>
    eop_idx = np.nonzero(ids == tok.eop_token_id)[0][0]
    assert inputs.labels[eop_idx - 1] == tok.eop_token_id


def test_inference_mode_and_padding(tok):
    conv = [ConvTurn("describe", "")]
    inputs, _ = prepare_vlm_inputs(conv, tok, 4, inference=True, grounding=False)
    assert inputs.labels is None
    padded = pad_to(inputs, 64)
    assert len(padded.input_ids) == 64
    assert padded.attention_mask.sum() == len(inputs.input_ids)
    assert (padded.input_ids[len(inputs.input_ids):] == 0).all()


def test_extract_vg_positions(tok):
    conv = [ConvTurn("find", "a <p> x</p> b <p> yy</p>")]
    inputs, _ = prepare_vlm_inputs(conv, tok, 4, inference=False, grounding=True, bop_weight=1.0)
    pos, valid = extract_vg_positions(inputs.input_ids, tok.eop_token_id, 4)
    assert valid.tolist() == [True, True, False, False]
    np.testing.assert_array_equal(
        inputs.input_ids[pos[:2] + 1], [tok.eop_token_id] * 2
    )
