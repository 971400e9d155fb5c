#!/usr/bin/env python
"""Evaluation CLI: ``predict`` runs a model over a VQA/report test set to CSV;
``evaluate`` scores a CSV with a metric suite.

Equivalent surface to the reference evaluator (``scripts/evaluate/cli.py``):

    python scripts/evaluate/cli.py predict -c conf/tiny/fit.yaml \
        --task vqa --dataset-dir <processed/VQA-RAD> --output pred.csv
    python scripts/evaluate/cli.py evaluate --task vqa --input pred.csv

Metric suites: ``generic`` (BLEU/ROUGE/METEOR/EM, native implementations) and
``cxr`` (CheXpert-14 F1/FNR via the pluggable labeler). Model-backed suites
(BERTScore, CheXbert, RadGraph, LLM judge) activate when their checkpoints are
available locally.
"""
from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax.numpy as jnp
import numpy as np


def iter_vqa_items(dataset_dir: Path, limit=None):
    data = json.loads((dataset_dir / "test.json").read_text())
    count = 0
    for x in data:
        for vqa in x.get("vqa", []):
            for image in x["image"]:
                yield {"image": image, "question": vqa["question"], "answer": vqa["answer"]}
                count += 1
                if limit and count >= limit:
                    return


def iter_report_items(dataset_dir: Path, name: str, limit=None):
    data = json.loads((dataset_dir / "test-processed.json").read_text())
    count = 0
    for x in data:
        for i, image in enumerate(x["image"]):
            if name == "MIMIC-CXR" and x.get("plane") and x["plane"][i] not in ("AP", "PA"):
                continue
            yield {
                "image": image,
                "question": "Please write a radiology report for me:",
                "answer": x["processed_report"],
            }
            count += 1
            if limit and count >= limit:
                return


def cmd_predict_baseline(args):
    """Run a registered baseline VLM over the same test items as ``predict``
    (ref ``scripts/evaluate/models/*``); writes the identical CSV contract."""
    from baselines import build_baseline

    predict = build_baseline(args.model, args.checkpoint, args.tokenizer)
    dataset_dir = Path(args.dataset_dir)
    if args.task == "vqa":
        items = iter_vqa_items(dataset_dir, args.limit)
    else:
        items = iter_report_items(dataset_dir, dataset_dir.name, args.limit)
    rows = []
    for item in items:
        img = dataset_dir / item["image"] if not Path(item["image"]).is_absolute() else Path(item["image"])
        rows.append({
            "question": item["question"], "answer": item["answer"],
            "prediction": predict(str(img), item["question"]),
        })
        print(f"[{len(rows)}] {rows[-1]['prediction'][:60]!r}", flush=True)
    with open(args.output, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["question", "answer", "prediction"])
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {len(rows)} predictions to {args.output}")


def cmd_predict(args):
    from demo import load_model, prepare_image

    from mmmm_tpu.config import build, load_yaml
    from mmmm_tpu.data import ConvTurn
    from mmmm_tpu.data.input_builder import prepare_vlm_inputs
    from mmmm_tpu.data.local import DatasetConf
    from mmmm_tpu.models.inference import generate_grounded

    model, params, tokenizer, cfg = load_model(args.config, args.adapter, quantize=getattr(args, 'quantize', False))
    from mmmm_tpu.parallel.sharding import tp_serving_params

    params, attn_impl = tp_serving_params(params, getattr(args, "tp", 1))
    dconf = build(DatasetConf, (cfg.get("data") or {}).get("conf") or {})
    dataset_dir = Path(args.dataset_dir)
    if args.task == "vqa":
        items = iter_vqa_items(dataset_dir, args.limit)
    else:
        items = iter_report_items(dataset_dir, dataset_dir.name, args.limit)

    # batched predict: bucket by (image shape, patch, pool, prompt bucket) so
    # each group runs one compiled generate over B rows — the serial B=1 loop
    # left the chip ~85% idle at eval shapes. Ragged prompts right-pad to a
    # 32-token bucket; per-row prompt_len keeps semantics identical.
    batch_n = max(1, getattr(args, "batch", 8))
    prepared = []
    for item in items:
        img_path = dataset_dir / item["image"] if not Path(item["image"]).is_absolute() else Path(item["image"])
        image, _, patch, pool, n_tokens = prepare_image(str(img_path), dconf)
        inputs, _ = prepare_vlm_inputs(
            [ConvTurn(item["question"], "")], tokenizer, n_tokens,
            inference=True, grounding=False,
        )
        s = len(inputs.input_ids)
        bucket = -(-s // 32) * 32
        key = (tuple(image.shape), tuple(patch), tuple(pool), bucket)
        prepared.append((key, item, image, inputs, s))

    rows = [None] * len(prepared)
    groups: dict = {}
    for idx, rec in enumerate(prepared):
        groups.setdefault(rec[0], []).append(idx)
    import numpy as _np

    if getattr(args, "continuous", False):
        # slot-pool scheduler: requests of one (image, patch, pool) family
        # stream through a GroundedServer — finished rows refill mid-flight,
        # so mixed answer lengths pay mean, not max
        from mmmm_tpu.models.serving import GroundedServer

        img_groups: dict = {}
        for idx, rec in enumerate(prepared):
            img_groups.setdefault(rec[0][:3], []).append(idx)
        for (img_shape, patch, pool), idxs in img_groups.items():
            n_vis = prepared[idxs[0]][3].token_type_ids.count(1) if isinstance(
                prepared[idxs[0]][3].token_type_ids, list
            ) else int(_np.sum(_np.asarray(prepared[idxs[0]][3].token_type_ids) == 1))
            server = GroundedServer(
                params, model.cfg, tokenizer, patch_size=patch, pool_size=pool,
                n_vis=n_vis, n_slots=batch_n,
                max_new_tokens=args.max_new_tokens,
                max_prompt_len=max(prepared[i][4] for i in idxs),
                attn_impl=attn_impl,
            )
            reqs = [
                {
                    "input_ids": _np.asarray(prepared[i][3].input_ids, _np.int32),
                    "token_type_ids": _np.asarray(prepared[i][3].token_type_ids, _np.int32),
                    "position_ids": _np.asarray(prepared[i][3].position_ids, _np.int32),
                    "image": _np.asarray(prepared[i][2], _np.float32),
                }
                for i in idxs
            ]
            outs = server.generate(reqs)
            for i, o in zip(idxs, outs):
                item = prepared[i][1]
                rows[i] = {
                    "question": item["question"], "answer": item["answer"],
                    "prediction": o["text"],
                }
                print(f"[{i}] {o['text'][:60]!r}", flush=True)
        rows = [r for r in rows if r is not None]
        with open(args.output, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["question", "answer", "prediction"])
            writer.writeheader()
            writer.writerows(rows)
        print(f"wrote {len(rows)} predictions to {args.output}")
        return

    for key, idxs in groups.items():
        _, patch, pool, bucket = key
        for start in range(0, len(idxs), batch_n):
            chunk = idxs[start : start + batch_n]
            b = len(chunk)
            ids = _np.zeros((b, bucket), _np.int32)
            tt = _np.zeros((b, bucket), _np.int32)
            pos = _np.zeros((b, bucket), _np.int32)
            plen = _np.zeros((b,), _np.int32)
            imgs = _np.stack([prepared[i][2] for i in chunk])
            for row, i in enumerate(chunk):
                inp, s = prepared[i][3], prepared[i][4]
                ids[row, :s] = inp.input_ids
                tt[row, :s] = inp.token_type_ids
                pos[row, :s] = inp.position_ids
                plen[row] = s
            res = generate_grounded(
                params, model.cfg, tokenizer,
                jnp.asarray(ids), jnp.asarray(tt), jnp.asarray(pos),
                jnp.asarray(plen), jnp.asarray(imgs), patch, pool,
                max_new_tokens=args.max_new_tokens,
                attn_impl=attn_impl,
                spec_draft_len=getattr(args, "speculate", 0),
            )
            for row, i in enumerate(chunk):
                item = prepared[i][1]
                rows[i] = {
                    "question": item["question"], "answer": item["answer"],
                    "prediction": res.text[row],
                }
                print(f"[{i}] {res.text[row][:60]!r}", flush=True)
    rows = [r for r in rows if r is not None]
    with open(args.output, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["question", "answer", "prediction"])
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {len(rows)} predictions to {args.output}")


def _build_model_hooks(args):
    """Instantiate model-backed scorers for whichever checkpoints exist."""
    hooks = {}
    if args.chexbert:
        from transformers import AutoTokenizer

        from mmmm_tpu.eval.models import ChexbertLabeler

        tok = AutoTokenizer.from_pretrained(args.chexbert_tokenizer or "bert-base-uncased",
                                            local_files_only=True)
        hooks["chexbert"] = ChexbertLabeler(args.chexbert, tokenizer=tok)
    if args.radbert:
        from transformers import AutoTokenizer

        from mmmm_tpu.eval.models import RadBertClassifier

        tok = AutoTokenizer.from_pretrained(args.radbert_tokenizer, local_files_only=True)
        hooks["radbert"] = RadBertClassifier(args.radbert, tokenizer=tok)
    if args.bertscore_model:
        from mmmm_tpu.eval.models import BERTScorer

        hooks["bertscore"] = BERTScorer(model_dir=args.bertscore_model)
    return hooks


def cmd_evaluate(args):
    from mmmm_tpu.eval import CTMetrics, CXRMetrics, GenericMetrics
    from mmmm_tpu.eval.composite import RADCLIQ_COLUMNS, radcliq_scores

    with open(args.input) as f:
        rows = list(csv.DictReader(f))
    predictions = [r["prediction"] for r in rows]
    references = [r["answer"] for r in rows]
    hooks = _build_model_hooks(args)
    suite = {}
    columns: dict[str, list[float]] = {}
    if args.suite in ("generic", "all"):
        gm = GenericMetrics(bertscore_fn=hooks.get("bertscore"))
        per_row = [gm.compute(p, r) for p, r in zip(predictions, references)]
        for k in per_row[0] if per_row else []:
            columns[k] = [x[k] for x in per_row]
            suite[k] = sum(columns[k]) / len(columns[k])
    if args.suite in ("cxr", "all"):
        cxr = CXRMetrics(labeler=hooks.get("chexbert"))
        suite.update(cxr.compute(predictions, references))
        suite["chexbert_model_backed"] = float("chexbert" in hooks)
        if "chexbert" in hooks:
            columns["chexbert"] = [
                hooks["chexbert"].similarity(p, r)
                for p, r in zip(predictions, references)
            ]
            suite["chexbert"] = sum(columns["chexbert"]) / len(columns["chexbert"])
    if args.suite == "ct":
        ct = CTMetrics(labeler=hooks.get("radbert"))
        suite.update(ct.compute(predictions, references=references))
        suite["radbert_model_backed"] = float("radbert" in hooks)
    if args.suite in ("cxr", "all"):
        # RadGraph-F1 column: official radgraph package > precomputed
        # annotations > taxonomy heuristic (provenance flagged in the output)
        from mmmm_tpu.eval.radgraph import radgraph_f1

        pre = {}
        if args.radgraph_annotations:
            ann = json.loads(Path(args.radgraph_annotations).read_text())
            pre = {"hyp_annotations": ann["hyp"], "ref_annotations": ann["ref"]}
        rg = radgraph_f1(predictions, references, **pre)
        columns["radgraph"] = rg["radgraph"]
        suite["radgraph_f1"] = rg["radgraph_mean"]
        suite["radgraph_annotator"] = rg["annotator"]
        # RadCliQ composite over [radgraph, bertscore, chexbert, bleu2];
        # missing model-backed columns are zero-filled and the run is flagged.
        missing = [c for c in RADCLIQ_COLUMNS if c not in columns]
        n = len(predictions)
        full = {c: columns.get(c, [0.0] * n) for c in RADCLIQ_COLUMNS}
        scores = radcliq_scores(full, checkpoint_dir=args.radcliq_dir)
        for k, v in scores.items():
            suite[k] = sum(v) / len(v) if v else 0.0
        if missing:
            suite["radcliq_missing_columns"] = float(len(missing))
    out = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in suite.items()}
    print(json.dumps(out, indent=2))
    if args.output:
        Path(args.output).write_text(json.dumps(out, indent=2))
    if args.per_row_output and columns:
        with open(args.per_row_output, "w", newline="") as f:
            # provenance comment line (read back with comment='#'): makes the
            # labeler/annotator source conspicuous next to the metric columns
            prov = {k: v for k, v in suite.items()
                    if k.endswith(("_labeler", "_annotator", "_model_backed"))}
            f.write("# provenance: " + json.dumps(prov) + "\n")
            writer = csv.DictWriter(f, fieldnames=["question", "answer", "prediction", *columns])
            writer.writeheader()
            for i, row in enumerate(rows):
                row = {k: row.get(k, "") for k in ("question", "answer", "prediction")}
                row.update({k: round(columns[k][i], 4) for k in columns})
                writer.writerow(row)


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="command", required=True)
    p = sub.add_parser("predict")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--adapter")
    p.add_argument("--quantize", action="store_true", help="W8A16 int8 serving")
    p.add_argument("--tp", type=int, default=1, metavar="N",
                   help="tensor-parallel serving over N devices "
                        "(tests/test_tp_serving.py pins token-identity)")
    p.add_argument("--task", choices=["vqa", "report"], required=True)
    p.add_argument("--dataset-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--limit", type=int)
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--batch", type=int, default=8,
                   help="rows per compiled generate (bucketed by image/prompt shape)")
    p.add_argument("--speculate", type=int, default=0, metavar="K",
                   help="n-gram speculative decoding, K drafts/step (0 = greedy; "
                        "token-identical output)")
    p.add_argument("--continuous", action="store_true",
                   help="slot-pool continuous batching (GroundedServer)")
    p.set_defaults(func=cmd_predict)
    b = sub.add_parser("predict-baseline")
    b.add_argument("--model", required=True,
                   help="registry name: mmmm|cogvlm|instructblip|llavanext|llavamed|m3d|radfm|r2gengpt")
    b.add_argument("--checkpoint", required=True, help="local checkpoint dir")
    b.add_argument("--tokenizer", help="local tokenizer/processor dir (default: checkpoint)")
    b.add_argument("--task", choices=["vqa", "report"], required=True)
    b.add_argument("--dataset-dir", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--limit", type=int)
    b.set_defaults(func=cmd_predict_baseline)
    e = sub.add_parser("evaluate")
    e.add_argument("--task", choices=["vqa", "report"], default="report")
    e.add_argument("--input", required=True)
    e.add_argument("--suite", choices=["generic", "cxr", "ct", "all"], default="all")
    e.add_argument("--output")
    e.add_argument("--per-row-output", help="CSV with per-study metric columns")
    e.add_argument("--chexbert", help="CheXbert checkpoint (.pth) for model-backed CXR labels")
    e.add_argument("--chexbert-tokenizer", help="local bert-base-uncased tokenizer dir")
    e.add_argument("--radbert", help="RadBertClassifier checkpoint for CT labels")
    e.add_argument("--radbert-tokenizer", help="local RadBERT tokenizer dir")
    e.add_argument("--bertscore-model", help="local HF encoder dir for BERTScore")
    e.add_argument("--radcliq-dir", help="dir with normalizer.pkl + composite_metric_v{0,1}.pkl")
    e.add_argument("--radgraph-annotations",
                   help='offline RadGraph-model annotations JSON {"hyp": [...], "ref": [...]}')
    e.set_defaults(func=cmd_evaluate)
    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
