"""Model-backed eval stack: RadCliQ composite, CheXbert/RadBERT loaders,
native BERTScore (ref ``scripts/evaluate/utils.py:108-607``)."""
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mmmm_tpu.eval.composite import (
    CompositeMetric,
    fallback_composite,
    load_radcliq,
    radcliq_scores,
    radgraph_reward,
)


class _RefScaler:
    """Pickled stand-in for sklearn StandardScaler (attribute bag)."""

    def __init__(self, mean, scale):
        self.mean_ = np.asarray(mean)
        self.scale_ = np.asarray(scale)


class _RefComposite:
    def __init__(self, coefs, scaler=None):
        self.coefs = np.asarray(coefs)
        self.scaler = scaler


def _write_radcliq_pickles(tmp_path):
    norm = _RefScaler([0.5, 0.6, 0.7, 0.2], [0.2, 0.1, 0.3, 0.15])
    inner = _RefScaler([0.1, -0.2, 0.05, 0.3], [1.1, 0.9, 1.2, 0.8])
    v0 = _RefComposite([-1.0, -0.5, -0.8, -0.3, 2.0], scaler=inner)
    v1 = _RefComposite([-3.1, -1.4, -2.0, -0.9, 4.0], scaler=None)
    (tmp_path / "normalizer.pkl").write_bytes(pickle.dumps(norm))
    (tmp_path / "composite_metric_v0.pkl").write_bytes(pickle.dumps(v0))
    (tmp_path / "composite_metric_v1.pkl").write_bytes(pickle.dumps(v1))
    return norm, v0, v1


def test_radcliq_pickle_loading_matches_sequential_application(tmp_path):
    norm, v0_ref, v1_ref = _write_radcliq_pickles(tmp_path)
    v0, v1 = load_radcliq(
        tmp_path / "normalizer.pkl",
        tmp_path / "composite_metric_v0.pkl",
        tmp_path / "composite_metric_v1.pkl",
    )
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (5, 4))
    # reference path: v0.predict(normalizer.transform(x)) with v0's own scaler
    xt = (x - norm.mean_) / norm.scale_
    xt = (xt - v0_ref.scaler.mean_) / v0_ref.scaler.scale_
    want_v0 = np.concatenate([xt, np.ones((5, 1))], 1) @ v0_ref.coefs
    want_v1 = np.concatenate([x, np.ones((5, 1))], 1) @ v1_ref.coefs
    np.testing.assert_allclose(v0.predict(x), want_v0, rtol=1e-12)
    np.testing.assert_allclose(v1.predict(x), want_v1, rtol=1e-12)


def test_radcliq_scores_uses_pickles_or_fallback(tmp_path):
    _write_radcliq_pickles(tmp_path)
    rows = {
        "radgraph": [0.5, 0.7],
        "bertscore": [0.6, 0.8],
        "chexbert": [0.9, 0.4],
        "bleu2": [0.2, 0.3],
    }
    out = radcliq_scores(rows, checkpoint_dir=tmp_path)
    assert set(out) == {"radcliq-v0", "radcliq-v1"}
    out_fb = radcliq_scores(rows, checkpoint_dir=None)
    assert set(out_fb) == {"radcliq_fallback"}
    x = np.stack([rows[c] for c in ("radgraph", "bertscore", "chexbert", "bleu2")], 1)
    np.testing.assert_allclose(out_fb["radcliq_fallback"], fallback_composite(x))


def test_radgraph_reward_relation_tagging():
    hyp = {"entities": {
        "1": {"tokens": "effusion", "label": "OBS-DP", "relations": [["located_at", "2"]]},
        "2": {"tokens": "pleural", "label": "ANAT-DP", "relations": []},
    }}
    ref = {"entities": {
        "1": {"tokens": "effusion", "label": "OBS-DP", "relations": [["located_at", "2"]]},
        "2": {"tokens": "pleural", "label": "ANAT-DP", "relations": []},
        "3": {"tokens": "cardiomegaly", "label": "OBS-DP", "relations": []},
    }}
    # hyp matches 2 of 3 ref entities -> P=1, R=2/3, F1=0.8
    assert radgraph_reward(hyp, ref) == pytest.approx(0.8)
    # relation presence changes identity: an entity that matches only when
    # relation-free still counts, but the relation-tagged one no longer does
    hyp2 = {"entities": {
        "1": {"tokens": "effusion", "label": "OBS-DP", "relations": []},
        "2": {"tokens": "cardiomegaly", "label": "OBS-DP", "relations": []},
    }}
    # only cardiomegaly matches: P=1/2, R=1/3 -> F1=0.4
    assert radgraph_reward(hyp2, ref) == pytest.approx(0.4)


def _tiny_bert_tokenizer(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "no", "pleural", "effusion", "cardiomegaly", "is", "seen", "."]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab))
    return transformers.BertTokenizer(str(vf))


def _tiny_bert_cfg():
    return dict(vocab_size=12, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=64, type_vocab_size=2)


def test_chexbert_labeler_loads_and_labels(tmp_path):
    from transformers import BertConfig, BertModel

    from mmmm_tpu.eval.cxr import CHEXPERT_CONDITIONS, CXRMetrics
    from mmmm_tpu.eval.models import ChexbertLabeler

    torch.manual_seed(0)
    bert = BertModel(BertConfig(**_tiny_bert_cfg()))
    state = {f"module.bert.{k}": v for k, v in bert.state_dict().items()}
    for i in range(14):
        n_cls = 2 if i == 13 else 4  # CheXbert: No Finding head is binary
        head = torch.nn.Linear(32, n_cls)
        state[f"module.linear_heads.{i}.weight"] = head.weight.data
        state[f"module.linear_heads.{i}.bias"] = head.bias.data
    ckpt = tmp_path / "chexbert.pth"
    torch.save({"model_state_dict": state}, ckpt)

    lab = ChexbertLabeler(ckpt, tokenizer=_tiny_bert_tokenizer(tmp_path))
    labels = lab("pleural effusion is seen .")
    assert labels.shape == (14,)
    assert set(np.unique(labels)) <= {0, 1}
    sim = lab.similarity("pleural effusion", "pleural effusion")
    assert sim == pytest.approx(1.0, abs=1e-5)
    # plugs into CXRMetrics as the labeler hook
    m = CXRMetrics(labeler=lab)
    out = m.compute(["pleural effusion"], ["pleural effusion"])
    assert "chexpert_macro_f1_14" in out
    assert len(CHEXPERT_CONDITIONS) == 14


def test_radbert_classifier_loads(tmp_path):
    from transformers import RobertaConfig, RobertaModel

    from mmmm_tpu.eval.models import RadBertClassifier

    torch.manual_seed(0)
    backbone = RobertaModel(RobertaConfig(**_tiny_bert_cfg()))
    state = {f"model.{k}": v for k, v in backbone.state_dict().items()}
    fc = torch.nn.Linear(32, 18)
    state["fc.weight"], state["fc.bias"] = fc.weight.data, fc.bias.data
    ckpt = tmp_path / "RadBertClassifier.pth"
    torch.save(state, ckpt)
    clf = RadBertClassifier(ckpt, tokenizer=_tiny_bert_tokenizer(tmp_path))
    labels = clf("no cardiomegaly .")
    assert labels.shape == (18,)
    assert set(np.unique(labels)) <= {0, 1}


def test_bertscore_native(tmp_path):
    from transformers import BertConfig, BertModel

    from mmmm_tpu.eval.models import BERTScorer

    torch.manual_seed(0)
    model = BertModel(BertConfig(**_tiny_bert_cfg()))
    scorer = BERTScorer(model=model, tokenizer=_tiny_bert_tokenizer(tmp_path))
    same = scorer("pleural effusion is seen .", "pleural effusion is seen .")
    assert same == pytest.approx(1.0, abs=1e-5)
    diff = scorer("no cardiomegaly .", "pleural effusion is seen .")
    assert diff < same
