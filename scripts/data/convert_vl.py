#!/usr/bin/env python
"""Convert raw VQA / report datasets into the processed vision-language JSON.

Covers the converter roles of ``scripts/data/vl/*`` (VQA-RAD, SLAKE, report
datasets): the output contract is ``<out>/<name>/{split}.json`` (VQA) or
``{split}-processed.json`` (reports), each a list of

    {"key", "image": [paths], "modality": [..], "plane": [..],
     "vqa": [{"question", "answer"}], "processed_report", "findings",
     "impression", "anomaly_pos", "anomaly_neg"}

Supported inputs:
  - ``--format vqa-json``: a JSON list with image/question/answer fields
    (VQA-RAD / SLAKE style; configurable field names);
  - ``--format report-folder``: a folder of ``<key>.txt`` raw reports +
    ``<key>.(png|jpg)`` images — sectioned with the native report sectioner
    and labeled with the keyword CheXpert labeler for anomaly_pos/neg.
"""
from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent.parent))


def convert_vqa_json(src: Path, out_dir: Path, *, image_field: str, question_field: str,
                     answer_field: str, image_dir: Path | None, split_field: str | None):
    rows = json.loads(src.read_text())
    by_split = defaultdict(lambda: defaultdict(list))
    for row in rows:
        split = (row.get(split_field) or "train").lower() if split_field else "train"
        split = {"val": "validate", "valid": "validate"}.get(split, split)
        img = row[image_field]
        if image_dir:
            img = str(image_dir / img)
        by_split[split][img].append(
            {"question": str(row[question_field]), "answer": str(row[answer_field])}
        )
    out_dir.mkdir(parents=True, exist_ok=True)
    for split, by_img in by_split.items():
        items = [
            {"key": f"{i}", "image": [img], "modality": None, "vqa": qa}
            for i, (img, qa) in enumerate(sorted(by_img.items()))
        ]
        (out_dir / f"{split}.json").write_text(json.dumps(items, indent=1))
        print(f"{split}: {len(items)} images, {sum(len(x['vqa']) for x in items)} QA pairs")


def convert_report_folder(src: Path, out_dir: Path, split: str):
    from mmmm_tpu.eval.cxr import CHEXPERT_CONDITIONS, KeywordChexpertLabeler
    from mmmm_tpu.preprocess.report import build_processed_report, extract_findings_impression

    labeler = KeywordChexpertLabeler()
    items = []
    for txt in sorted(src.glob("*.txt")):
        key = txt.stem
        image = next((p for ext in (".png", ".jpg", ".jpeg", ".pt.zst")
                      if (p := txt.with_name(key + ext)).exists()), None)
        if image is None:
            continue
        sections = extract_findings_impression(txt.read_text())
        report = build_processed_report(**sections)
        if not report:
            continue
        labels = labeler(report)
        pos = [c for c, l in zip(CHEXPERT_CONDITIONS[:-1], labels[:-1]) if l]
        neg = [c for c, l in zip(CHEXPERT_CONDITIONS[:-1], labels[:-1]) if not l]
        items.append({
            "key": key,
            "image": [str(image)],
            "modality": ["X-ray"],
            "plane": ["PA"],
            "findings": sections["findings"],
            "impression": sections["impression"],
            "processed_report": report,
            "anomaly_pos": pos,
            "anomaly_neg": neg[:4],
        })
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / f"{split}-processed.json").write_text(json.dumps(items, indent=1))
    print(f"{split}: {len(items)} reports")


def convert_mimic_cxr(reports_root: Path, out_dir: Path, *, split_csv: Path,
                      jpg_root: Path | None, metadata_csv: Path | None):
    """Official-layout MIMIC-CXR conversion (ref ``scripts/data/vl/MIMIC-CXR/
    MIMIC-CXR.py:276-444``): walk ``files/pXX/pXXXXXXXX/sXXXXXXXX.txt``,
    section each report, keep studies with findings >= 10 words AND
    impression >= 2 words, strip communication notes from the impression, and
    route studies into train/validate/test via the official split CSV.
    ``metadata_csv`` (mimic-cxr-2.0.0-metadata.csv) supplies per-image
    ViewPosition -> the ``plane`` field the frontal-view logic consumes."""
    import csv as _csv

    from mmmm_tpu.preprocess.report import extract_findings_impression

    split_map: dict[tuple[str, str], str] = {}
    with open(split_csv, newline="") as f:
        for row in _csv.DictReader(f):
            split_map[("s" + row["study_id"], "p" + row["subject_id"])] = row["split"]
    planes: dict[str, str] = {}
    if metadata_csv is not None:
        with open(metadata_csv, newline="") as f:
            for row in _csv.DictReader(f):
                planes[row["dicom_id"]] = row.get("ViewPosition") or ""

    by_split: dict[str, list] = {"train": [], "validate": [], "test": []}
    n_seen = n_kept = 0
    for txt in sorted(reports_root.rglob("s*.txt")):
        study_id, subject_id = txt.stem, txt.parent.name
        group = txt.parent.parent.name
        n_seen += 1
        sections = extract_findings_impression(txt.read_text())
        findings, impression = sections["findings"], sections["impression"]
        if not findings or not impression:
            continue
        if len(findings.split()) < 10 or len(impression.split()) < 2:
            continue
        images, img_planes = [], []
        if jpg_root is not None:
            study_dir = jpg_root / "files" / group / subject_id / study_id
            if study_dir.is_dir():
                for p in sorted(study_dir.iterdir()):
                    images.append(str(p))
                    img_planes.append(planes.get(p.stem, ""))
        split = split_map.get((study_id, subject_id), "train")
        split = {"val": "validate", "valid": "validate"}.get(split, split)
        by_split.setdefault(split, []).append({
            "key": study_id,
            "image": images,
            "modality": ["X-ray"] * len(images),
            "plane": img_planes,
            "findings": findings,
            "impression": impression,
        })
        n_kept += 1
    out_dir.mkdir(parents=True, exist_ok=True)
    for split, items in by_split.items():
        (out_dir / f"{split}.json").write_text(json.dumps(items, indent=1))
        print(f"{split}: {len(items)} studies")
    print(f"kept {n_kept}/{n_seen} reports")


# CT-RATE anomaly-label column -> taxonomy name (ref ``scripts/data/vl/
# CT-RATE/process-text.py:11-29``; coronary calcification folds into the
# arterial class there too)
CT_RATE_LABELS = [
    ("Arterial wall calcification", "arterial wall calcification"),
    ("Cardiomegaly", "cardiomegaly"),
    ("Pericardial effusion", "pericardial effusion"),
    ("Coronary artery wall calcification", "arterial wall calcification"),
    ("Hiatal hernia", "hiatal hernia"),
    ("Lymphadenopathy", "lymphadenopathy"),
    ("Emphysema", "emphysema"),
    ("Atelectasis", "atelectasis"),
    ("Lung nodule", "nodule"),
    ("Lung opacity", "pulmonary opacification"),
    ("Pleural effusion", "pleural effusion"),
    ("Peribronchial thickening", "peribronchial thickening"),
    ("Consolidation", "pulmonary consolidation"),
    ("Bronchiectasis", "bronchiectasis"),
    ("Interlobular septal thickening", "interlobular septal thickening"),
]


def convert_ct_rate(dataset_dir: Path, out_dir: Path, split: str,
                    metadata_csv: Path | None = None):
    """CT-RATE text+label conversion (ref ``process-text.py:40-86``): join the
    radiology report CSV with the 18-condition predicted-label CSV per study
    directory, emitting ``{split}-raw.json`` with findings / impression /
    anomaly_pos / anomaly_neg. Volumes themselves go through
    ``scripts/data/process.py``-style image preprocessing; CT-RATE nii files
    store raw values — reconstruct HU as ``slope * v + intercept`` with the
    metadata CSV's RescaleSlope/RescaleIntercept when provided."""
    import csv as _csv

    reports_name = "train_reports.csv" if split == "train" else "validation_reports.csv"
    labels_name = "train_predicted_labels.csv" if split == "train" else "valid_predicted_labels.csv"
    report_rows: dict[str, dict] = {}
    with open(dataset_dir / "radiology_text_reports" / reports_name, newline="") as f:
        for row in _csv.DictReader(f):
            report_rows[row["VolumeName"]] = row
    label_rows: dict[str, dict] = {}
    with open(dataset_dir / "multi_abnormality_labels" / labels_name, newline="") as f:
        for row in _csv.DictReader(f):
            label_rows[row["VolumeName"]] = row
    # HU reconstruction params: CT-RATE nii voxels are raw detector values;
    # HU = RescaleSlope * v + RescaleIntercept (+ per-axis spacings)
    meta_rows: dict[str, dict] = {}
    if metadata_csv is not None:
        with open(metadata_csv, newline="") as f:
            for row in _csv.DictReader(f):
                meta_rows[row["VolumeName"]] = row

    image_dir = dataset_dir / ("train" if split == "train" else "valid")
    data = []
    for patient_dir in sorted(p for p in image_dir.iterdir() if p.is_dir()):
        for study_dir in sorted(p for p in patient_dir.iterdir() if p.is_dir()):
            volumes = sorted(study_dir.glob("*.nii.gz"))
            if not volumes:
                continue
            ref = report_rows.get(volumes[0].name)
            lab = label_rows.get(volumes[0].name)
            if ref is None or lab is None or not ref.get("Findings_EN", "").strip():
                continue
            pos, neg = set(), set()
            for col, name in CT_RATE_LABELS:
                (pos if lab.get(col, "0").strip() in ("1", "1.0", "True") else neg).add(name)
            study = {
                "key": study_dir.name,
                "image": [str(v) for v in volumes],
                "modality": ["CT"] * len(volumes),
                "findings": ref["Findings_EN"].strip(),
                "anomaly_pos": sorted(pos),
                "anomaly_neg": sorted(neg - pos),
            }
            if ref.get("Impressions_EN", "").strip():
                study["impression"] = ref["Impressions_EN"].strip()
            if meta_rows:
                rescale = []
                for v in volumes:
                    m = meta_rows.get(v.name, {})
                    rescale.append({
                        "slope": float(m.get("RescaleSlope", 1) or 1),
                        "intercept": float(m.get("RescaleIntercept", 0) or 0),
                        "xy_spacing": m.get("XYSpacing"),
                        "z_spacing": m.get("ZSpacing"),
                    })
                study["rescale"] = rescale
            data.append(study)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / f"{split}-raw.json").write_text(json.dumps(data, indent=1))
    print(f"{split}: {len(data)} studies")


def label_reports(dataset_dir: Path, split: str, chexbert_ckpt: Path | None = None,
                  labeler=None) -> Path:
    """Anomaly-label a converted dataset's reports (ref ``scripts/data/vl/
    label.py:17-104``: the reference labels VL training reports with the
    CheXbert MODEL). With ``chexbert_ckpt`` (or an injected ``labeler``) the
    real ``eval.models.ChexbertLabeler`` runs; otherwise the keyword labeler
    is the flagged fallback. Writes ``anomaly_pos/anomaly_neg`` (+ a
    ``labeler`` provenance field) in place and returns the json path."""
    from mmmm_tpu.eval.cxr import CHEXPERT_CONDITIONS, KeywordChexpertLabeler

    if labeler is not None:
        name = getattr(labeler, "name", "custom")
    elif chexbert_ckpt is not None:
        from mmmm_tpu.eval.models import ChexbertLabeler

        model = ChexbertLabeler(chexbert_ckpt)
        labeler, name = model.label, "chexbert"
    else:
        labeler, name = KeywordChexpertLabeler(), "keyword"

    path = dataset_dir / f"{split}.json"
    data = json.loads(path.read_text())
    for item in data:
        report = item.get("processed_report") or "\n".join(
            filter(None, [item.get("findings"), item.get("impression")])
        )
        labels = np.asarray(labeler(report))
        # condition list ends with "No Finding" — excluded from pos/neg sets
        item["anomaly_pos"] = [
            c for c, l in zip(CHEXPERT_CONDITIONS[:-1], labels[:-1]) if l
        ]
        item["anomaly_neg"] = [
            c for c, l in zip(CHEXPERT_CONDITIONS[:-1], labels[:-1]) if not l
        ][:4]
        item["labeler"] = name
    path.write_text(json.dumps(data, indent=1))
    print(f"{split}: labeled {len(data)} reports with {name}")
    return path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--format",
        choices=["vqa-json", "report-folder", "mimic-cxr", "ct-rate", "label"],
        required=True,
    )
    parser.add_argument("--chexbert-ckpt", help="CheXbert checkpoint for --format label")
    parser.add_argument("--src", required=True)
    parser.add_argument("--out", required=True, help="output dataset dir")
    parser.add_argument("--image-field", default="image_name")
    parser.add_argument("--question-field", default="question")
    parser.add_argument("--answer-field", default="answer")
    parser.add_argument("--split-field", default=None)
    parser.add_argument("--image-dir", default=None)
    parser.add_argument("--split", default="train")
    parser.add_argument("--split-csv", help="mimic-cxr-2.0.0-split.csv")
    parser.add_argument("--metadata-csv", help="mimic-cxr-2.0.0-metadata.csv (planes)")
    args = parser.parse_args(argv)
    src, out = Path(args.src), Path(args.out)
    if args.format == "vqa-json":
        convert_vqa_json(
            src, out, image_field=args.image_field, question_field=args.question_field,
            answer_field=args.answer_field,
            image_dir=Path(args.image_dir) if args.image_dir else None,
            split_field=args.split_field,
        )
    elif args.format == "mimic-cxr":
        convert_mimic_cxr(
            src, out,
            split_csv=Path(args.split_csv),
            jpg_root=Path(args.image_dir) if args.image_dir else None,
            metadata_csv=Path(args.metadata_csv) if args.metadata_csv else None,
        )
    elif args.format == "ct-rate":
        convert_ct_rate(
            src, out, args.split,
            metadata_csv=Path(args.metadata_csv) if args.metadata_csv else None,
        )
    elif args.format == "label":
        label_reports(
            src, args.split,
            chexbert_ckpt=Path(args.chexbert_ckpt) if args.chexbert_ckpt else None,
        )
    else:
        convert_report_folder(src, out, args.split)


if __name__ == "__main__":
    main()
