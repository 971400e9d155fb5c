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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--format", choices=["vqa-json", "report-folder"], required=True)
    parser.add_argument("--src", required=True)
    parser.add_argument("--out", required=True, help="output dataset dir")
    parser.add_argument("--image-field", default="image_name")
    parser.add_argument("--question-field", default="question")
    parser.add_argument("--answer-field", default="answer")
    parser.add_argument("--split-field", default=None)
    parser.add_argument("--image-dir", default=None)
    parser.add_argument("--split", default="train")
    args = parser.parse_args(argv)
    src, out = Path(args.src), Path(args.out)
    if args.format == "vqa-json":
        convert_vqa_json(
            src, out, image_field=args.image_field, question_field=args.question_field,
            answer_field=args.answer_field,
            image_dir=Path(args.image_dir) if args.image_dir else None,
            split_field=args.split_field,
        )
    else:
        convert_report_folder(src, out, args.split)


if __name__ == "__main__":
    main()
