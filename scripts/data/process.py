#!/usr/bin/env python
"""Offline dataset processing driver (``scripts/data/local/process.py`` analog).

    python scripts/data/process.py --layout nnunet --src raw/Task_X \
        --out data/processed/local [--name X] [--limit N]
    python scripts/data/process.py --layout segfolder --src raw/TotalSeg \
        --out data/processed/local
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--layout", choices=["nnunet", "segfolder", "boxfolder"])
    parser.add_argument("--dataset", help="named recipe from preprocess.registry (e.g. AMOS22)")
    parser.add_argument("--src", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--name")
    parser.add_argument("--modality", default="CT")
    parser.add_argument("--limit", type=int)
    parser.add_argument("--max-smaller-edge", type=int, default=512)
    args = parser.parse_args(argv)

    from mmmm_tpu.preprocess.processor import NNUNetProcessor, ProcessorConfig
    from mmmm_tpu.preprocess.seg_folder import SegFolderProcessor

    conf = ProcessorConfig(max_smaller_edge=args.max_smaller_edge)
    if args.dataset:
        from mmmm_tpu.preprocess.registry import build_processor

        proc = build_processor(args.dataset, Path(args.src), Path(args.out), conf)
    elif args.layout == "boxfolder":
        from mmmm_tpu.preprocess.boxes import BoxFolderProcessor, load_box_cases

        proc = BoxFolderProcessor(
            args.name or "boxes", load_box_cases(Path(args.src)), Path(args.out), conf=conf
        )
    elif args.layout:
        cls = {"nnunet": NNUNetProcessor, "segfolder": SegFolderProcessor}[args.layout]
        proc = cls(Path(args.src), Path(args.out), name=args.name, modality=args.modality, conf=conf)
    else:
        parser.error("one of --dataset or --layout is required")
    info = proc.process(limit=args.limit)
    ok = sum(1 for r in info if r["status"] == "ok")
    exists = sum(1 for r in info if r["status"] == "exists")
    print(f"{proc.name}: {ok} processed, {exists} existing, {len(info) - ok - exists} failed/skipped")


if __name__ == "__main__":
    main()
