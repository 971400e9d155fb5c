"""LLM judge, CT metrics, seg-folder processor, and VL converter tests."""
import json

import numpy as np
import pytest

from mmmm_tpu.eval import CTMetrics, CT_CONDITIONS, LLMJudge
from mmmm_tpu.eval.judge import parse_binary, parse_scale


def test_judge_parsing():
    assert parse_binary(" 1 ") == 1.0
    assert parse_binary("0.") == 0.0
    assert parse_binary("maybe") is None
    assert parse_scale("8") == 0.8
    assert parse_scale("10/10") == 1.0
    assert parse_scale("n/a") is None


def test_judge_scoring_with_stub():
    judge = LLMJudge(lambda prompts: ["1"] * (len(prompts) - 1) + ["0"])
    rows = [{"question": f"q{i}", "reference": "yes", "prediction": "yes"} for i in range(4)]
    out = judge.score_binary(rows)
    assert out["judge_accuracy"] == pytest.approx(3 / 4)
    assert out["judge_parse_rate"] == 1.0
    judge2 = LLMJudge(lambda prompts: ["7"] * len(prompts))
    out2 = judge2.score_scale(rows)
    assert out2["judge_score"] == pytest.approx(0.7)


def test_ct_metrics_with_labels():
    preds = [
        "There is emphysema and a lung nodule.",
        "No pleural effusion. Normal study.",
    ]
    y_true = np.zeros((2, len(CT_CONDITIONS)), np.int64)
    y_true[0, CT_CONDITIONS.index("Emphysema")] = 1
    y_true[0, CT_CONDITIONS.index("Lung nodule")] = 1
    m = CTMetrics().compute(preds, reference_labels=y_true)
    assert m["ct_micro_f1_18"] == pytest.approx(1.0)


def test_seg_folder_processor(tmp_path):
    from mmmm_tpu.preprocess.nifti import write_nifti
    from mmmm_tpu.preprocess.seg_folder import SegFolderProcessor
    from mmmm_tpu.preprocess.processor import ProcessorConfig

    rng = np.random.default_rng(0)
    case = tmp_path / "raw" / "s001"
    (case / "segmentations").mkdir(parents=True)
    affine = np.diag([1.0, 1.0, 4.0, 1.0])
    write_nifti(case / "ct.nii.gz", rng.normal(50, 10, size=(16, 16, 8)).astype(np.float32), affine)
    liver = np.zeros((16, 16, 8), np.uint8)
    liver[4:10, 4:10, 2:5] = 1
    write_nifti(case / "segmentations" / "liver.nii.gz", liver, affine)
    spleen = np.zeros((16, 16, 8), np.uint8)
    spleen[12:15, 12:15, 5:7] = 1
    write_nifti(case / "segmentations" / "spleen.nii.gz", spleen, affine)

    proc = SegFolderProcessor(tmp_path / "raw", tmp_path / "out", conf=ProcessorConfig(max_smaller_edge=64))
    info = proc.process()
    assert info[0]["status"] == "ok", info

    from mmmm_tpu.data.sparse import Sparse

    sparse = Sparse.from_json((tmp_path / "out/raw/data/s001/sparse.json").read_bytes())
    names = {t.name for ts in sparse.targets.values() for t in ts}
    assert names == {"liver", "spleen"}


def test_convert_vqa_json(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts" / "data"))
    import convert_vl

    rows = [
        {"image_name": "a.png", "question": "Is it normal?", "answer": "yes", "phase": "train"},
        {"image_name": "a.png", "question": "Modality?", "answer": "CT", "phase": "train"},
        {"image_name": "b.png", "question": "Is it normal?", "answer": "no", "phase": "test"},
    ]
    src = tmp_path / "raw.json"
    src.write_text(json.dumps(rows))
    out = tmp_path / "VQA-demo"
    convert_vl.convert_vqa_json(
        src, out, image_field="image_name", question_field="question",
        answer_field="answer", image_dir=None, split_field="phase",
    )
    train = json.loads((out / "train.json").read_text())
    test = json.loads((out / "test.json").read_text())
    assert len(train) == 1 and len(train[0]["vqa"]) == 2
    assert len(test) == 1


def test_convert_report_folder(tmp_path):
    import convert_vl

    (tmp_path / "r1.txt").write_text(
        "FINDINGS: Large pleural effusion on the right. IMPRESSION: Effusion."
    )
    from PIL import Image

    Image.fromarray(np.zeros((8, 8), np.uint8), "L").save(tmp_path / "r1.png")
    out = tmp_path / "out"
    convert_vl.convert_report_folder(tmp_path, out, "train")
    items = json.loads((out / "train-processed.json").read_text())
    assert len(items) == 1
    assert "Pleural Effusion" in items[0]["anomaly_pos"]
    assert items[0]["processed_report"].startswith("Findings:")


def test_radgraph_heuristic_annotator_and_f1():
    """RadGraph annotator (VERDICT r2 missing #3): entities with DP/DA
    negation labels + located_at relations, reward contract shared with
    eval.composite.radgraph_reward."""
    from mmmm_tpu.eval.radgraph import (
        HeuristicRadGraphAnnotator, build_annotator, radgraph_f1,
    )

    ann = HeuristicRadGraphAnnotator()
    report = "There is a nodule in the left lung . No pleural effusion ."
    (out,) = ann.annotate([report])
    ents = out["entities"].values()
    by_text = {e["tokens"].lower(): e for e in ents}
    assert by_text["nodule"]["label"] == "OBS-DP"
    assert by_text["pleural effusion"]["label"] == "OBS-DA"  # negated
    assert by_text["left lung"]["label"] == "ANAT-DP"
    # the nodule observation relates to the nearby anatomy
    assert by_text["nodule"]["relations"], by_text["nodule"]

    # identical reports -> F1 == 1; disjoint findings -> 0
    r = radgraph_f1([report], [report])
    assert r["radgraph_mean"] == 1.0 and r["annotator"] == "heuristic"
    r2 = radgraph_f1(["There is cardiomegaly ."], ["Pneumothorax is seen ."])
    assert r2["radgraph_mean"] == 0.0

    # precomputed annotations path
    h = ann.annotate([report])
    r3 = radgraph_f1([report], [report], hyp_annotations=h, ref_annotations=h)
    assert r3["radgraph_mean"] == 1.0 and r3["annotator"] == "precomputed"
    assert build_annotator().source == "heuristic"  # no radgraph pkg here


def test_judge_end_to_end_over_llm_batch():
    """The full LlamaMetrics-equivalent path with a REAL local model: judge
    prompts -> llm_batch batched generation (jitted prefill+decode) -> parse
    -> aggregate. The tiny random model's lm_head is biased toward the '1'
    byte so the binary parse has a deterministic outcome (the reference's
    vLLM judge is external; the harness contract is what's pinned here)."""
    import jax
    import jax.numpy as jnp

    from mmmm_tpu.data import MMMMTokenizer
    from mmmm_tpu.eval.judge import LLMJudge
    from mmmm_tpu.models import MMMMConfig, MMMMModel
    from mmmm_tpu.models.llm_batch import make_text_generator

    tok = MMMMTokenizer.byte_fallback()
    cfg = MMMMConfig.tiny(vocab_size=len(tok)).vlm
    params = MMMMModel(MMMMConfig.tiny(vocab_size=len(tok))).init(
        jax.random.PRNGKey(0)
    )["cogvlm"]
    (one_id,) = tok.encode("1")
    head = params["llm"]["lm_head"]
    params["llm"]["lm_head"] = head.at[:, one_id].add(jnp.float32(8.0))

    gen = make_text_generator(
        params, cfg, tok, max_new_tokens=4, batch_size=2, attn_impl="xla"
    )
    rows = [
        {"question": "Is there pneumonia?", "reference": "yes", "prediction": "yes"},
        {"question": "Which lobe?", "reference": "left lower", "prediction": "left lower"},
        {"question": "Modality?", "reference": "CT", "prediction": "CT"},
    ]
    judge = LLMJudge(gen)
    out = judge.score_binary(rows)
    assert out["judge_parse_rate"] == 1.0
    assert out["judge_accuracy"] == 1.0
