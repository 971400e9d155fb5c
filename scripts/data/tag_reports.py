#!/usr/bin/env python
"""VG phrase tagging: reports -> ``visual-grounding/<ds>/<split>.json``.

The end-to-end driver the reference runs with vLLM Llama-3-70B
(``/root/reference/scripts/data/vg/tag.py:300-380``): for every study in a
processed VL dataset, the two-pass LLM tagger (tag, then positive-filter)
marks anatomical/anomaly phrases as ``[phrase](target)`` markdown, the
round-trip validator converts them into char-offset ``tags``, and the study
lands in the VG dataset json that ``GRGTransform`` consumes (together with the
per-study image list / planes).

The LLM is the local batched harness (``models.llm_batch.make_text_generator``
— the vLLM equivalent); ``--taxonomy-only`` runs the deterministic
synonym-matching tagger instead (flagged in the output), which is also the
per-report fallback whenever an LLM output fails round-trip validation.

    python scripts/data/tag_reports.py --dir <processed/MIMIC-CXR> \
        --split train --out <visual-grounding/MIMIC-CXR> \
        [--params lm.npz --config lm.yaml --tokenizer <dir> | --taxonomy-only]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def tag_dataset(
    dataset_dir: Path,
    split: str,
    out_dir: Path,
    generate_fn=None,
    *,
    target_tax: dict | None = None,
    batch_size: int = 64,
) -> Path:
    """Tag every study's report; returns the written json path. With
    ``generate_fn=None`` the taxonomy matcher tags directly."""
    from mmmm_tpu.data.target_tax import get_target_tax
    from mmmm_tpu.preprocess.tagging import LLMTagger, TaxonomyTagger

    tax = target_tax if target_tax is not None else get_target_tax()
    fallback = TaxonomyTagger(tax)
    if generate_fn is None:
        tagger, source = fallback, "taxonomy"
    else:
        seen, names = set(), []
        for cls in tax.values():
            if id(cls) in seen:
                continue
            seen.add(id(cls))
            names.append(cls.name)
        tagger = LLMTagger(generate_fn, names, fallback=fallback)
        source = "llm"

    data = json.loads((Path(dataset_dir) / f"{split}.json").read_text())
    reports = [
        d.get("processed_report")
        or "\n".join(filter(None, [d.get("findings"), d.get("impression")]))
        for d in data
    ]
    items = []
    n_fallback = 0
    for start in range(0, len(data), batch_size):
        chunk = data[start : start + batch_size]
        texts = reports[start : start + batch_size]
        if isinstance(tagger, LLMTagger):
            tags_batch = tagger.tag_batch(texts)
        else:
            tags_batch = [tagger.tag(t) for t in texts]
        for study, report, tags in zip(chunk, texts, tags_batch):
            if not report:
                continue
            for t in tags:  # offsets must round-trip (tag.py assertion)
                assert report[t["start"]:t["end"]] == t["phrase"], t
            item = {
                "key": study.get("key"),
                "image": study.get("image", []),
                "ref_report": report,
                "tags": [
                    {"start": t["start"], "end": t["end"], "target": t["target"]}
                    for t in tags
                ],
                "tagger": source,
            }
            if study.get("plane"):
                item["plane"] = study["plane"]
            items.append(item)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{split}.json"
    out_path.write_text(json.dumps(items, indent=1))
    n_tagged = sum(1 for i in items if i["tags"])
    print(f"{split}: {len(items)} studies, {n_tagged} with tags ({source}) -> {out_path}")
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dir", required=True, help="processed VL dataset dir")
    ap.add_argument("--split", default="train")
    ap.add_argument("--out", required=True, help="visual-grounding output dir")
    ap.add_argument("--taxonomy-only", action="store_true")
    ap.add_argument("--params", help="LM params .npz")
    ap.add_argument("--config", help="CogVLMConfig yaml/json for --params")
    ap.add_argument("--tokenizer", help="tokenizer path for --params")
    ap.add_argument("--max-new-tokens", type=int, default=1024)
    ap.add_argument("--continuous", action="store_true",
                    help="slot-pool continuous batching (mid-flight refill, "
                         "automatic template prefix caching)")
    ap.add_argument("--speculate", type=int, default=0,
                    help="n-gram speculative draft length (continuous only)")
    args = ap.parse_args(argv)

    generate_fn = None
    if not args.taxonomy_only:
        if not args.params:
            ap.error("pass --params (local LM checkpoint) or --taxonomy-only")
        from mmmm_tpu.config import build, load_yaml
        from mmmm_tpu.data.tokenizer import MMMMTokenizer
        from mmmm_tpu.models.cogvlm import CogVLMConfig
        from mmmm_tpu.models.llm_batch import make_text_generator
        from mmmm_tpu.train.checkpoint import load_params

        cfg = build(CogVLMConfig, load_yaml(args.config) if args.config else {})
        tok = (MMMMTokenizer.from_pretrained(args.tokenizer) if args.tokenizer
               else MMMMTokenizer.byte_fallback())
        generate_fn = make_text_generator(
            load_params(args.params), cfg, tok, max_new_tokens=args.max_new_tokens,
            continuous=args.continuous, speculate=args.speculate,
        )
    tag_dataset(Path(args.dir), args.split, Path(args.out), generate_fn)


if __name__ == "__main__":
    main()
