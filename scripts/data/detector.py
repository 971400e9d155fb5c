#!/usr/bin/env python
"""Pseudo-box detector CLI: train on VinDr-CXR fused boxes, infer over tagged
studies to write ``{key}_box.json`` files.

TPU-native replacement for the reference's detrex pipeline
(``scripts/data/vg/MIMIC-CXR/detrex/tools/MIMIC-CXR-vg/{train_net,infer}.py``):

    # train on a processed VinDr-CXR dir (output of scripts/data/process.py)
    python scripts/data/detector.py train --data <processed/VinDr-CXR> \
        --out ckpt/ --steps 20000 --batch 8

    # write pseudo-boxes for tagged studies (the grg stage-3 input contract)
    python scripts/data/detector.py infer --ckpt ckpt/ --images <dir> \
        --tags <vg.json> --out <dir>

``--tags`` is the tagged-report JSON (one item per study with ``image`` paths
and ``tags: [{target: ...}]``), mirroring the reference's dataset func
(``infer.py:51-77``). Only detections of classes actually tagged in the
report are kept (score >= 0.1, best-of-class fallback), per ``infer.py:84-96``.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np


def _load_case(case_dir: Path, size: int, class_to_idx, max_gt: int):
    from mmmm_tpu.data.sparse import Sparse
    from mmmm_tpu.utils import load_pt_zst

    sp = Sparse.from_json((case_dir / "sparse.json").read_bytes())
    img = load_pt_zst(case_dir / "images.pt.zst")  # (1, D, H, W) uint8
    img = np.asarray(img[0, 0], np.float32) / 255.0  # (H, W)
    h, w = img.shape
    # nearest resize to the static training size
    yi = np.clip((np.arange(size) + 0.5) * h / size, 0, h - 1).astype(np.int64)
    xi = np.clip((np.arange(size) + 0.5) * w / size, 0, w - 1).astype(np.int64)
    img = img[yi][:, xi]
    boxes = np.zeros((max_gt, 4), np.float32)
    classes = np.zeros((max_gt,), np.int32)
    valid = np.zeros((max_gt,), bool)
    i = 0
    for targets in sp.targets.values():
        for t in targets:
            if t.boxes is None or t.name not in class_to_idx:
                continue
            for b in np.asarray(t.boxes, np.float64):
                if i >= max_gt:
                    break
                # (d0, h0, w0, d1, h1, w1) -> normalized cxcywh
                y0, x0, y1, x1 = b[1] / h, b[2] / w, b[4] / h, b[5] / w
                boxes[i] = [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0]
                classes[i] = class_to_idx[t.name]
                valid[i] = True
                i += 1
    return img[..., None], boxes, classes, valid


def cmd_train(args):
    import jax
    import jax.numpy as jnp
    import optax

    from mmmm_tpu.models.detector import (
        VINDR_CLASSES, DetectorConfig, detector_loss, init_detector_params,
    )
    from mmmm_tpu.train.checkpoint import save_params

    cfg = DetectorConfig(image_size=args.size, enc_layers=args.layers,
                         dec_layers=args.layers, num_queries=args.queries,
                         max_gt=min(24, args.queries))
    class_to_idx = {n: i for i, n in enumerate(VINDR_CLASSES)}
    data_dir = Path(args.data) / "data"
    case_dirs = sorted(p for p in data_dir.iterdir() if (p / "sparse.json").exists())
    if not case_dirs:
        raise SystemExit(f"no processed cases under {data_dir}")
    print(f"{len(case_dirs)} cases; classes={cfg.num_classes}")

    params = init_detector_params(jax.random.PRNGKey(args.seed), cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(0.1),
        optax.adamw(optax.cosine_decay_schedule(args.lr, args.steps), weight_decay=1e-4),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, images, gb, gc, gv):
        loss, grads = jax.value_and_grad(detector_loss)(params, cfg, images, gb, gc, gv)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(args.seed)
    for it in range(args.steps):
        idx = rng.integers(0, len(case_dirs), args.batch)
        batch = [_load_case(case_dirs[i], cfg.image_size, class_to_idx, cfg.max_gt)
                 for i in idx]
        images = jnp.asarray(np.stack([b[0] for b in batch]))
        gb = jnp.asarray(np.stack([b[1] for b in batch]))
        gc = jnp.asarray(np.stack([b[2] for b in batch]))
        gv = jnp.asarray(np.stack([b[3] for b in batch]))
        params, opt_state, loss = step(params, opt_state, images, gb, gc, gv)
        if it % args.log_every == 0:
            print(f"[{it}] loss={float(loss):.4f}", flush=True)

    # mAP@0.5 on a held-out tail (the detrex COCO-eval analog); logged so
    # pseudo-label quality is a tracked number, not a hope
    if args.eval_frac > 0:
        from mmmm_tpu.models.detector import (
            box_cxcywh_to_xyxy, compute_map, detector_forward,
        )

        n_eval = max(1, int(len(case_dirs) * args.eval_frac))
        fwd = jax.jit(lambda img: detector_forward(params, cfg, img))
        dets, gts = [], []
        for case in case_dirs[-n_eval:]:
            img, gb, gc, gv = _load_case(case, cfg.image_size, class_to_idx, cfg.max_gt)
            out = fwd(jnp.asarray(img[None]))
            prob = 1 / (1 + np.exp(-np.asarray(out["class_logits"][0], np.float64)))
            xyxy = np.clip(np.asarray(box_cxcywh_to_xyxy(out["boxes"][0])), 0, 1)
            cls = prob.argmax(-1)
            dets.append({"boxes": xyxy, "scores": prob.max(-1), "classes": cls})
            gt_xyxy = np.asarray(box_cxcywh_to_xyxy(jnp.asarray(gb)))[gv.astype(bool)]
            gts.append({"boxes": gt_xyxy, "classes": gc[gv.astype(bool)]})
        ap = compute_map(dets, gts, cfg.num_classes)
        print(f"mAP@0.5 (held-out {n_eval}) = {ap:.4f}", flush=True)

    cli_cfg = {k: v for k, v in vars(args).items() if isinstance(v, (int, float, str, bool))}
    save_params(Path(args.out), {"params": params, "cfg": cli_cfg})
    print(f"saved detector to {args.out}")


def _read_image(path: Path) -> np.ndarray:
    if path.suffix == ".zst" or path.name.endswith(".pt.zst"):
        from mmmm_tpu.utils import load_pt_zst

        arr = np.asarray(load_pt_zst(path), np.float32)
        while arr.ndim > 2:
            arr = arr[0]
        return arr
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), np.float32)


def cmd_infer(args):
    import jax
    import jax.numpy as jnp

    from mmmm_tpu.models.detector import (
        VINDR_CLASSES, DetectorConfig, detector_forward, equalize_image, select_boxes,
    )
    from mmmm_tpu.train.checkpoint import load_params

    state = load_params(Path(args.ckpt))
    params = state["params"]
    cfg = DetectorConfig(image_size=args.size, enc_layers=args.layers,
                         dec_layers=args.layers, num_queries=args.queries,
                         max_gt=min(24, args.queries))
    fwd = jax.jit(lambda img: detector_forward(params, cfg, img))

    items = json.loads(Path(args.tags).read_text())
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_written = 0
    for item in items:
        tagged = sorted({t["target"] for t in item.get("tags", [])
                         if t.get("target") in VINDR_CLASSES})
        for image_rel in item["image"]:
            img_path = Path(args.images) / image_rel if args.images else Path(image_rel)
            if not img_path.exists():
                continue
            raw = _read_image(img_path)
            h, w = raw.shape
            eq = equalize_image(raw).astype(np.float32) / 255.0
            yi = np.clip((np.arange(cfg.image_size) + 0.5) * h / cfg.image_size, 0, h - 1).astype(np.int64)
            xi = np.clip((np.arange(cfg.image_size) + 0.5) * w / cfg.image_size, 0, w - 1).astype(np.int64)
            net_in = jnp.asarray(eq[yi][:, xi][None, ..., None])
            out = fwd(net_in)
            logits = np.asarray(out["class_logits"][0], np.float32)
            boxes = np.asarray(out["boxes"][0], np.float32)
            results = select_boxes(logits, boxes, tagged, (h, w),
                                   score_th=args.score_th)
            stem = img_path.name.split(".")[0]
            (out_dir / f"{stem}_box.json").write_text(json.dumps(results, indent=2))
            n_written += 1
    print(f"wrote {n_written} *_box.json files to {out_dir}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="command", required=True)
    t = sub.add_parser("train")
    t.add_argument("--data", required=True, help="processed VinDr-CXR dir")
    t.add_argument("--out", required=True)
    t.add_argument("--steps", type=int, default=20000)
    t.add_argument("--batch", type=int, default=8)
    t.add_argument("--size", type=int, default=512)
    t.add_argument("--layers", type=int, default=3)
    t.add_argument("--queries", type=int, default=100)
    t.add_argument("--lr", type=float, default=2e-4)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log-every", type=int, default=50)
    t.add_argument("--eval-frac", type=float, default=0.1,
                   help="held-out tail fraction for the mAP@0.5 gauge")
    t.set_defaults(func=cmd_train)
    i = sub.add_parser("infer")
    i.add_argument("--ckpt", required=True)
    i.add_argument("--tags", required=True, help="tagged-report JSON")
    i.add_argument("--images", help="image root (paths in tags are relative)")
    i.add_argument("--out", required=True)
    i.add_argument("--size", type=int, default=512)
    i.add_argument("--layers", type=int, default=3)
    i.add_argument("--queries", type=int, default=100)
    i.add_argument("--score-th", type=float, default=0.1)
    i.set_defaults(func=cmd_infer)
    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
