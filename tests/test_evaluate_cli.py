"""Evaluate CLI end-to-end: predict (tiny model over synthetic VQA) -> evaluate."""
import csv
import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))


def test_predict_and_evaluate(tmp_path):
    # load the evaluator by explicit path (its filename would shadow
    # scripts/cli.py under the module name "cli")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "eval_cli", Path(__file__).parent.parent / "scripts/evaluate/cli.py"
    )
    eval_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eval_cli)

    ds = tmp_path / "VQA-demo"
    ds.mkdir()
    rng = np.random.default_rng(0)
    img = ds / "img0.png"
    Image.fromarray(rng.integers(0, 255, size=(48, 48), dtype=np.uint8).copy(), "L").save(img)
    (ds / "test.json").write_text(json.dumps([
        {"key": "0", "image": ["img0.png"],
         "vqa": [{"question": "Is the heart normal?", "answer": "yes"},
                 {"question": "Any effusion?", "answer": "no"}]}
    ]))

    pred_csv = tmp_path / "pred.csv"
    eval_cli.main([
        "predict", "-c", str(Path(__file__).parent.parent / "conf/tiny/fit.yaml"),
        "--task", "vqa", "--dataset-dir", str(ds),
        "--output", str(pred_csv), "--max-new-tokens", "4",
    ])
    rows = list(csv.DictReader(pred_csv.open()))
    assert len(rows) == 2
    assert rows[0]["answer"] == "yes"

    # continuous serving path: identical predictions
    pred_csv2 = tmp_path / "pred2.csv"
    eval_cli.main([
        "predict", "-c", str(Path(__file__).parent.parent / "conf/tiny/fit.yaml"),
        "--task", "vqa", "--dataset-dir", str(ds),
        "--output", str(pred_csv2), "--max-new-tokens", "4", "--continuous",
        "--batch", "2",
    ])
    rows2 = list(csv.DictReader(pred_csv2.open()))
    assert [r["prediction"] for r in rows2] == [r["prediction"] for r in rows]

    out_json = tmp_path / "metrics.json"
    eval_cli.main([
        "evaluate", "--input", str(pred_csv), "--suite", "all", "--output", str(out_json),
    ])
    metrics = json.loads(out_json.read_text())
    assert "bleu1" in metrics and "chexpert_micro_f1_14" in metrics


def test_provenance_flags_in_summary_and_csv(tmp_path):
    """Heuristic eval fallbacks must be conspicuous in the OUTPUT (VERDICT r3
    weak #6): the summary carries the labeler/annotator source next to every
    affected metric, and the per-row CSV leads with a provenance comment."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "eval_cli2", Path(__file__).parent.parent / "scripts/evaluate/cli.py"
    )
    eval_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eval_cli)

    pred_csv = tmp_path / "pred.csv"
    with pred_csv.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["question", "answer", "prediction"])
        w.writeheader()
        w.writerow({"question": "q", "answer": "small effusion seen",
                    "prediction": "there is a pleural effusion"})
        w.writerow({"question": "q", "answer": "clear lungs",
                    "prediction": "no acute findings"})

    out_json = tmp_path / "metrics.json"
    per_row = tmp_path / "per_row.csv"
    eval_cli.main([
        "evaluate", "--input", str(pred_csv), "--suite", "all",
        "--output", str(out_json), "--per-row-output", str(per_row),
    ])
    m = json.loads(out_json.read_text())
    # every heuristic-backed metric family carries its source in the summary
    assert m["chexpert_labeler"] == "keyword-heuristic"
    assert m["chexbert_model_backed"] == 0.0
    assert m["radgraph_annotator"] == "heuristic"
    assert "chexpert_micro_f1_14" in m and "radgraph_f1" in m
    # CT suite carries its own flag
    eval_cli.main([
        "evaluate", "--input", str(pred_csv), "--suite", "ct",
        "--output", str(out_json),
    ])
    mct = json.loads(out_json.read_text())
    assert mct["ct_labeler"] == "keyword-heuristic"
    assert mct["radbert_model_backed"] == 0.0
    # per-row CSV: first line is the provenance comment, then a parseable CSV
    lines = per_row.read_text().splitlines()
    assert lines[0].startswith("# provenance: ")
    prov = json.loads(lines[0].removeprefix("# provenance: "))
    assert prov["chexpert_labeler"] == "keyword-heuristic"
    assert prov["radgraph_annotator"] == "heuristic"
    rows = list(csv.DictReader(lines[1:]))
    assert len(rows) == 2 and "radgraph" in rows[0]
