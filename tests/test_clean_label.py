"""LLM report cleaning + model-backed CheXbert labeling wiring (offline data
scripts; ref ``scripts/data/vl/llama3_process.py`` + ``vl/label.py``)."""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts" / "data"))

import clean_reports  # noqa: E402
from clean_reports import CT_RATE_TRIGGERS, clean_dataset  # noqa: E402


def _write(dirp, split, items):
    dirp.mkdir(parents=True, exist_ok=True)
    (dirp / f"{split}.json").write_text(json.dumps(items))


def test_mimic_two_pass_chain(tmp_path):
    """MIMIC runs TWO prompt passes; the second consumes the first's output."""
    _write(tmp_path, "train", [
        {"key": "a", "findings": "Lungs are clear.", "impression": "Normal."},
        {"key": "b", "findings": "Edema unchanged.", "impression": "Stable edema."},
    ])
    calls = []

    def stub(prompts):
        calls.append(list(prompts))
        return [f"cleaned{len(calls)}:" + p.split("Input: ", 1)[1][:20] for p in prompts]

    out = clean_dataset(tmp_path, "MIMIC-CXR", "train", stub, cleaner_name="stub")
    data = json.loads(out.read_text())
    assert len(calls) == 2
    # pass 2 inputs embed pass 1 outputs
    assert all("cleaned1:" in p for p in calls[1])
    assert all(d["processed_report"].startswith("cleaned2:") for d in data)
    assert all(d["cleaner"] == "stub" for d in data)
    assert (tmp_path / "train-processed.csv").exists()


def test_ct_rate_trigger_gating(tmp_path):
    """Only reports with prior/history trigger words hit the LLM
    (llama3_process.py:105); the rest pass through verbatim."""
    _write(tmp_path, "train", [
        {"key": "a", "findings": "There is a nodule."},           # no trigger
        {"key": "b", "findings": "Compared to the prior exam."},  # trigger
    ])
    seen = []

    def stub(prompts):
        seen.extend(prompts)
        return ["CLEANED" for _ in prompts]

    out = clean_dataset(tmp_path, "CT-RATE", "train", stub)
    data = json.loads(out.read_text())
    assert len(seen) == 1 and "prior exam" in seen[0]
    assert data[0]["processed_report"] == "There is a nodule."
    assert data[1]["processed_report"] == "CLEANED"
    assert any(t in "compared to the prior exam." for t in CT_RATE_TRIGGERS)


def test_roco_caption_cleaning(tmp_path):
    _write(tmp_path, "train", [{"key": "a", "caption": "CT of a 26-year-old."}])
    out = clean_dataset(tmp_path, "ROCOv2", "train", lambda ps: ["CT scan."])
    data = json.loads(out.read_text())
    assert data[0]["processed_caption"] == "CT scan."


def test_rule_based_cleaner_runs(tmp_path):
    _write(tmp_path, "train", [
        {"key": "a", "findings": "Heart size is stable. There is a nodule."},
    ])
    out = clean_dataset(
        tmp_path, "CT-RATE", "train", clean_reports._rule_based_fn,
        cleaner_name="rule-based",
    )
    data = json.loads(out.read_text())
    assert "nodule" in data[0]["processed_report"]
    assert data[0]["cleaner"] == "rule-based"


def test_label_reports_keyword_and_injected_model(tmp_path):
    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts" / "data"))
    from convert_vl import label_reports

    from mmmm_tpu.eval.cxr import CHEXPERT_CONDITIONS

    _write(tmp_path, "train", [
        {"key": "a", "findings": "There is a large pleural effusion.",
         "impression": "Effusion."},
        {"key": "b", "findings": "Clear lungs.", "impression": "Normal."},
    ])
    label_reports(tmp_path, "train")
    data = json.loads((tmp_path / "train.json").read_text())
    assert data[0]["labeler"] == "keyword"
    assert "Pleural Effusion" in data[0]["anomaly_pos"]
    assert "Pleural Effusion" not in data[1]["anomaly_pos"]

    # injected model labeler (the ChexbertLabeler.label interface): flags all
    class Stub:
        name = "chexbert"

        def __call__(self, report):
            return np.ones(len(CHEXPERT_CONDITIONS), np.int64)

    label_reports(tmp_path, "train", labeler=Stub())
    data = json.loads((tmp_path / "train.json").read_text())
    assert data[1]["labeler"] == "chexbert"
    assert "Cardiomegaly" in data[1]["anomaly_pos"]
