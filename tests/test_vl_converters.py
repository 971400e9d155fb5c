"""MIMIC-CXR official-layout + CT-RATE converters and the upgraded sectioner
(ref ``scripts/data/vl/MIMIC-CXR/MIMIC-CXR.py``, ``CT-RATE/process-text.py``)."""
import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, "scripts/data")

from mmmm_tpu.preprocess.report import (
    extract_findings_impression,
    normalize_section_name,
    remove_communication_notes,
    split_sections,
)

REPORT = """                                 FINAL REPORT
 EXAMINATION:  CHEST (PA AND LAT)

 INDICATION:  Cough for three weeks.

 COMPARISON:  Chest radiograph from earlier.

 FINDINGS:

 The lungs are clear without focal consolidation. No pleural effusion or
 pneumothorax is seen. The cardiac and mediastinal silhouettes are
 unremarkable.

 IMPRESSSION:

 No acute cardiopulmonary process. Findings discussed with Dr. X by phone
 at 2pm. Persistent opacity should be re-evaluated.
"""


def test_sectioner_typo_and_priority():
    # "IMPRESSSION" (typo) folds to impression via fuzzy normalization
    assert normalize_section_name("IMPRESSSION") == "impression"
    assert normalize_section_name("findings/impression") == "impression"
    assert normalize_section_name("PA AND LATERAL CHEST") == "findings"
    assert normalize_section_name("reason for exam") == "indication"
    sections = split_sections(REPORT)
    assert "findings" in sections and "impression" in sections
    out = extract_findings_impression(REPORT)
    assert "lungs are clear" in out["findings"]
    # communication note cut: everything from the "discussed with Dr" sentence
    assert "Dr" not in out["impression"]
    assert out["impression"].startswith("No acute cardiopulmonary process")


def test_remove_communication_notes_keeps_clean_text():
    assert remove_communication_notes("Clear lungs. Stable.") == "Clear lungs. Stable."
    assert remove_communication_notes(
        "Effusion. Results were emailed to the team. More text."
    ) == "Effusion."


def test_last_paragraph_fallback():
    text = """ WET READ: something preliminary

 CHEST, TWO VIEWS:

 first paragraph setup text

 The heart is normal in size. No effusion.
"""
    out = extract_findings_impression(text)
    assert out["findings"] is not None


def _write_mimic_tree(root: Path):
    files = root / "files"
    d = files / "p10" / "p10000001"
    d.mkdir(parents=True)
    (d / "s50000001.txt").write_text(REPORT)
    short = REPORT.replace("The lungs are clear without focal consolidation. No pleural effusion or\n pneumothorax is seen. The cardiac and mediastinal silhouettes are\n unremarkable.", "Too short.")
    d2 = files / "p11" / "p11000002"
    d2.mkdir(parents=True)
    (d2 / "s50000002.txt").write_text(short)  # findings < 10 words -> dropped
    split_csv = root / "split.csv"
    with open(split_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["dicom_id", "study_id", "subject_id", "split"])
        w.writeheader()
        w.writerow({"dicom_id": "abc", "study_id": "50000001", "subject_id": "10000001", "split": "test"})
        w.writerow({"dicom_id": "def", "study_id": "50000002", "subject_id": "11000002", "split": "train"})
    jpg = root / "jpg" / "files" / "p10" / "p10000001" / "s50000001"
    jpg.mkdir(parents=True)
    (jpg / "abc.jpg").write_bytes(b"x")
    meta = root / "meta.csv"
    with open(meta, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["dicom_id", "ViewPosition"])
        w.writeheader()
        w.writerow({"dicom_id": "abc", "ViewPosition": "PA"})
    return split_csv, root / "jpg", meta


def test_convert_mimic_cxr(tmp_path):
    import convert_vl

    split_csv, jpg_root, meta = _write_mimic_tree(tmp_path)
    out = tmp_path / "out"
    convert_vl.main([
        "--format", "mimic-cxr", "--src", str(tmp_path / "files"), "--out", str(out),
        "--split-csv", str(split_csv), "--image-dir", str(jpg_root),
        "--metadata-csv", str(meta),
    ])
    test_items = json.loads((out / "test.json").read_text())
    assert len(test_items) == 1
    item = test_items[0]
    assert item["key"] == "s50000001"
    assert item["plane"] == ["PA"]
    assert len(item["image"]) == 1
    assert "lungs are clear" in item["findings"]
    # the short study must be filtered, not routed to train
    train_items = json.loads((out / "train.json").read_text())
    assert train_items == []


def test_convert_ct_rate(tmp_path):
    import convert_vl

    ds = tmp_path / "dataset"
    (ds / "radiology_text_reports").mkdir(parents=True)
    (ds / "multi_abnormality_labels").mkdir()
    vol_name = "train_1_a_1.nii.gz"
    with open(ds / "radiology_text_reports" / "train_reports.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["VolumeName", "Findings_EN", "Impressions_EN"])
        w.writeheader()
        w.writerow({"VolumeName": vol_name,
                    "Findings_EN": "Nodular opacity in the right lower lobe.",
                    "Impressions_EN": "Pulmonary nodule."})
    cols = ["VolumeName"] + [c for c, _ in convert_vl.CT_RATE_LABELS]
    with open(ds / "multi_abnormality_labels" / "train_predicted_labels.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        row = {c: "0" for c in cols}
        row["VolumeName"] = vol_name
        row["Lung nodule"] = "1"
        w.writerow(row)
    study_dir = ds / "train" / "train_1" / "train_1_a"
    study_dir.mkdir(parents=True)
    (study_dir / vol_name).write_bytes(b"x")
    meta = tmp_path / "meta.csv"
    with open(meta, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["VolumeName", "RescaleSlope", "RescaleIntercept", "XYSpacing", "ZSpacing"])
        w.writeheader()
        w.writerow({"VolumeName": vol_name, "RescaleSlope": "1", "RescaleIntercept": "-1024",
                    "XYSpacing": "[0.75, 0.75]", "ZSpacing": "1.5"})

    out = tmp_path / "out"
    convert_vl.main([
        "--format", "ct-rate", "--src", str(ds), "--out", str(out),
        "--split", "train", "--metadata-csv", str(meta),
    ])
    items = json.loads((out / "train-raw.json").read_text())
    assert len(items) == 1
    st = items[0]
    assert st["anomaly_pos"] == ["nodule"]
    assert "pleural effusion" in st["anomaly_neg"]
    assert st["impression"] == "Pulmonary nodule."
    assert st["rescale"][0]["intercept"] == -1024.0
    # every label name resolves in the taxonomy
    from mmmm_tpu.data.target_tax import get_target_tax

    tax = get_target_tax()
    for _, name in convert_vl.CT_RATE_LABELS:
        assert name in tax, name
