"""Metric implementations: sanity + known-value tests."""
import numpy as np
import pytest

from mmmm_tpu.eval import (
    CXRMetrics,
    GenericMetrics,
    KeywordChexpertLabeler,
    bleu,
    exact_match,
    meteor,
    rouge_l,
    rouge_n,
)


def test_bleu_perfect_and_zero():
    assert bleu("the cat sat on the mat", "the cat sat on the mat", 4) == pytest.approx(1.0)
    assert bleu("completely different words here", "the cat sat on the mat", 4) == 0.0
    assert bleu("", "reference") == 0.0
    # brevity penalty: short prediction scores below its precision
    full = bleu("the cat sat on the mat", "the cat sat on the mat", 1)
    short = bleu("the cat", "the cat sat on the mat", 1)
    assert short < full


def test_bleu_known_value():
    # 1-gram: overlap 3/4, len 4 vs 6 -> bp = exp(1 - 6/4)
    score = bleu("the cat the dog", "the cat sat on the mat", 1)
    expect = np.exp(1 - 6 / 4) * (3 / 4)
    assert score == pytest.approx(expect, rel=1e-6)


def test_rouge():
    assert rouge_n("a b c", "a b c", 1) == pytest.approx(1.0)
    assert rouge_l("a b c d", "a x b y c") == pytest.approx(2 * (3 / 4) * (3 / 5) / (3 / 4 + 3 / 5))
    assert rouge_n("x y", "a b", 1) == 0.0


def test_meteor_properties():
    assert meteor("the cat sat", "the cat sat") == pytest.approx(0.9999, abs=0.05)
    # scrambled word order is penalized via chunks
    ordered = meteor("the cat sat on the mat", "the cat sat on the mat")
    scrambled = meteor("mat the on sat cat the", "the cat sat on the mat")
    assert scrambled < ordered
    assert meteor("zzz", "the cat") == 0.0


def test_exact_match():
    assert exact_match(" Yes. ", "yes.") == 1.0
    assert exact_match("yes", "no") == 0.0


def test_generic_metrics_aggregate():
    gm = GenericMetrics()
    out = gm.compute_all(["the heart is normal"], ["the heart is normal"])
    assert out["bleu4"] == pytest.approx(1.0)
    assert out["exact_match"] == 1.0
    assert set(out) == {"bleu1", "bleu2", "bleu4", "rouge1", "rougeL", "meteor", "exact_match"}


def test_keyword_labeler_negation():
    lab = KeywordChexpertLabeler()
    pos = lab("There is a large pleural effusion. Cardiomegaly is present.")
    neg = lab("No pleural effusion. The heart is normal in size.")
    import mmmm_tpu.eval.cxr as cxr

    eff = cxr.CHEXPERT_CONDITIONS.index("Pleural Effusion")
    cardio = cxr.CHEXPERT_CONDITIONS.index("Cardiomegaly")
    nofind = cxr.CHEXPERT_CONDITIONS.index("No Finding")
    assert pos[eff] == 1 and pos[cardio] == 1 and pos[nofind] == 0
    assert neg[eff] == 0 and neg[nofind] == 1


def test_cxr_metrics_perfect_prediction():
    reports = [
        "There is a pleural effusion.",
        "No acute findings.",
        "Cardiomegaly with edema.",
    ]
    m = CXRMetrics().compute(reports, reports)
    assert m["chexpert_micro_f1_14"] == pytest.approx(1.0)
    assert m["chexpert_fnr_5"] == 0.0
