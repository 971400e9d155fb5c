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


# -- round-5 per-dataset adapters (VERDICT r4 missing #3) ---------------------

def _png(path: Path):
    from PIL import Image
    import numpy as np

    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(path)


def test_convert_openi(tmp_path):
    """OpenI quirks (ref OpenI/OpenI.py): uid-keyed image glob, rows without
    findings or impression dropped, images copied, seeded 90/10 split."""
    from convert_vl import convert_openi

    src, out = tmp_path / "src", tmp_path / "out"
    for uid, n_img in [("1", 2), ("2", 1), ("3", 1)]:
        for k in range(n_img):
            _png(src / "images" / "images_normalized" / f"{uid}_IM-{k}.dcm.png")
    src.mkdir(exist_ok=True)
    with open(src / "indiana_reports.csv", "w", newline="") as f:
        w = csv.DictWriter(f, ["uid", "findings", "impression"])
        w.writeheader()
        w.writerow({"uid": "1", "findings": "Clear lungs.", "impression": "Normal."})
        w.writerow({"uid": "2", "findings": "", "impression": "Normal."})  # dropped
        w.writerow({"uid": "3", "findings": "Opacity.", "impression": "Pneumonia."})
    convert_openi(src, out)
    train = json.loads((out / "train.json").read_text())
    test = json.loads((out / "test.json").read_text())
    items = train + test
    assert {i["key"] for i in items} == {"1", "3"}
    one = next(i for i in items if i["key"] == "1")
    assert len(one["image"]) == 2 and one["modality"] == ["X-ray", "X-ray"]
    assert all(Path(p).exists() for p in one["image"])  # copied under out/


def test_convert_rocov2(tmp_path):
    from convert_vl import convert_rocov2

    src, out = tmp_path / "src", tmp_path / "out"
    src.mkdir()
    with open(src / "train_captions.csv", "w", newline="") as f:
        w = csv.DictWriter(f, ["ID", "Caption"])
        w.writeheader()
        w.writerow({"ID": "ROCOv2_0001", "Caption": "CT of the chest."})
    convert_rocov2(src, out, "train")
    items = json.loads((out / "train.json").read_text())
    assert items == [{
        "key": "ROCOv2_0001",
        "image": [str(src / "train" / "ROCOv2_0001.jpg")],
        "caption": "CT of the chest.",
    }]


def test_convert_pmc_oa_caption_cleanup(tmp_path):
    """PMC-OA caption quirks (ref PMC-OA.py:20-28): strip, drop <10 chars,
    capitalize the first letter, enforce a trailing period; unreadable images
    dropped when checking."""
    from convert_vl import convert_pmc_oa

    src, out = tmp_path / "src", tmp_path / "out"
    img_root = src / "caption_T060_filtered_top4_sep_v0_subfigures"
    _png(img_root / "a.jpg")
    _png(img_root / "b.jpg")
    (img_root / "broken.jpg").write_bytes(b"not an image")
    rows = [
        {"image": "a.jpg", "caption": "  the chest radiograph shows nodules  "},
        {"image": "b.jpg", "caption": "short"},              # dropped: <10 chars
        {"image": "broken.jpg", "caption": "A long enough caption here."},
        {"image": "missing.jpg", "caption": "Another long caption text."},
    ]
    (src / "pmc_oa.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    convert_pmc_oa(src, out, num_val=1)
    items = (json.loads((out / "train.json").read_text())
             + json.loads((out / "validate.json").read_text()))
    assert len(items) == 1
    assert items[0]["caption"] == "The chest radiograph shows nodules."


def test_convert_radiopaedia(tmp_path):
    """Radiopaedia quirks (ref Radiopaedia/Radiopaedia.py:27-93): RadFM mount
    rewrite + .npy/.nii.gz -> .pt.zst, missing images dropped, plane
    normalization with None for unknowns, findings gating the vqa field."""
    from convert_vl import RADFM_MOUNT, convert_radiopaedia

    src, out = tmp_path / "src", tmp_path / "out"
    src.mkdir()
    img = out / "images" / "case1" / "vol.pt.zst"
    img.parent.mkdir(parents=True)
    img.write_bytes(b"x")
    data = [
        {
            "image_path": [f"{RADFM_MOUNT}/case1/vol.npy", f"{RADFM_MOUNT}/gone/x.nii.gz"],
            "image_modality": ["CT ", "MRI"],
            "plane_projection": ["Axial", "weird"],
            "finding": " Large mass. ",
            "qa_list": [{"question": "q", "answer": "a"}],
        },
        {  # all images missing -> dropped
            "image_path": [f"{RADFM_MOUNT}/gone/y.npy"],
            "image_modality": ["CT"], "plane_projection": ["axial"],
            "finding": "x", "qa_list": [],
        },
        {  # no finding -> image-only item (kept, no vqa/findings keys)
            "image_path": [f"{RADFM_MOUNT}/case1/vol.npy"],
            "image_modality": ["CT"], "plane_projection": [None],
            "finding": None, "qa_list": [],
        },
    ]
    (src / "rp.json").write_text(json.dumps(data))
    convert_radiopaedia(src, out, "rp.json")
    items = json.loads((out / "test.json").read_text())
    assert len(items) == 2
    assert items[0]["image"] == [str(img)]
    assert items[0]["modality"] == ["CT"]
    assert items[0]["plane"] == ["axial"]
    assert items[0]["findings"] == "Large mass."
    assert items[0]["vqa"] == [{"question": "q", "answer": "a"}]
    assert "findings" not in items[1] and items[1]["plane"] == [None]


def test_convert_vqa_med(tmp_path):
    """VQA-Med pipe format (ref VQA-Med.py:9-34): img|q|a grouped by image;
    test files carry a category column (img|cat|q|a)."""
    from convert_vl import convert_vqa_med

    src, out = tmp_path / "src", tmp_path / "out"
    tr = src / "ImageClef-2019-VQA-Med-Training"
    tr.mkdir(parents=True)
    (tr / "All_QA_Pairs_train.txt").write_text(
        "img2|what modality?|xray\nimg1|what plane?|axial\nimg1|normal?|yes\n"
    )
    te = src / "VQAMed2019Test"
    te.mkdir()
    (te / "VQAMed2019_Test_Questions_w_Ref_Answers.txt").write_text(
        "img9|modality|what modality?|ct\n"
    )
    convert_vqa_med(src, out)
    train = json.loads((out / "train.json").read_text())
    assert [len(x["vqa"]) for x in train] == [2, 1]  # img1 grouped, sorted first
    assert train[0]["vqa"][0] == {"question": "what plane?", "answer": "axial"}
    test = json.loads((out / "test.json").read_text())
    assert test[0]["vqa"] == [{"question": "what modality?", "answer": "ct"}]
