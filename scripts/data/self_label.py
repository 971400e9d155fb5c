#!/usr/bin/env python
"""Self-label CT volumes with the aligned SAM head (pseudo-mask construction).

Replaces the reference's vendored SAT inference for CT-RATE grounded-report
labels (``scripts/data/vg/CT-RATE/sat/inference.py``): instead of an external
text-prompted segmenter, the framework's own stage-0-aligned SAM produces the
per-target masks. For each case listed in a vg ``<split>.json`` it

  1. resolves the tagged targets present in the report,
  2. runs the SAM head with those classes' frozen prompt embeddings,
  3. thresholds the sigmoid masks and writes ``{key}_seg.pt.zst`` +
     ``{key}_seg.json`` — exactly the files ``GRGTransform`` consumes.

    python scripts/data/self_label.py --vg-dir data/processed/visual-grounding/CT-RATE \
        --sam runs/align-sam/sam_aligned.npz --embeddings embeds.npz \
        [--threshold 0.5] [--limit N]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--vg-dir", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--sam", required=True, help="sam params npz (align_sam output)")
    parser.add_argument("--embeddings", required=True, help="npz: class name -> (C,) prompt embedding")
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--max-targets", type=int, default=8)
    parser.add_argument("--patch-size", type=int, nargs=3, default=[8, 16, 16])
    parser.add_argument("--grid", type=int, nargs=3, default=[4, 16, 16],
                        help="token grid; input resized to grid*patch*pool")
    parser.add_argument("--sam-config", help="yaml with SamConfig fields (default: flagship)")
    parser.add_argument("--limit", type=int)
    args = parser.parse_args(argv)

    from mmmm_tpu.config import build
    from mmmm_tpu.data.vl import load_image_any
    from mmmm_tpu.data.transforms import resize_3d
    from mmmm_tpu.models.segvol import SamConfig, sam_forward
    from mmmm_tpu.train.checkpoint import load_adapter
    from mmmm_tpu.utils import save_pt_zst

    vg_dir = Path(args.vg_dir)
    items = json.loads((vg_dir / f"{args.split}.json").read_text())
    if args.limit:
        items = items[: args.limit]
    sam_params = jax.tree.map(jnp.asarray, load_adapter(args.sam))
    embeds_npz = np.load(args.embeddings)
    embeddings = {k: np.asarray(embeds_npz[k], np.float32) for k in embeds_npz.files}
    if args.sam_config:
        from mmmm_tpu.config import load_yaml

        cfg = build(SamConfig, load_yaml(args.sam_config))
    else:
        cfg = SamConfig()

    patch = tuple(args.patch_size)
    shape = tuple(g * p for g, p in zip(args.grid, patch))

    @jax.jit
    def run(image, prompts):
        masks, _ = sam_forward(sam_params, cfg, image, patch, prompts)
        return jax.nn.sigmoid(masks)

    done = 0
    for item in items:
        key = item.get("key") or Path(str(item["image"][0])).name.split(".")[0]
        out_seg = vg_dir / f"{key}_seg.pt.zst"
        if out_seg.exists():
            continue
        targets = sorted({t["target"] for t in item.get("tags", []) if t["target"] in embeddings})
        targets = targets[: args.max_targets]
        if not targets:
            continue
        vol = load_image_any(vg_dir / item["image"][0]).astype(np.float32) / 255.0
        orig_shape = vol.shape[1:]
        vol = resize_3d(vol, shape)
        if vol.shape[0] == 1:
            vol = np.repeat(vol, 3, axis=0)
        prompts = np.stack([embeddings[t] for t in targets])[None]  # (1, N, C)
        probs = run(jnp.asarray(vol)[None], jnp.asarray(prompts))[0]  # (N, D, H, W)
        probs = resize_3d(np.asarray(probs), orig_shape)
        masks = (probs > args.threshold).astype(bool)
        save_pt_zst(masks, out_seg)
        (vg_dir / f"{key}_seg.json").write_text(json.dumps(targets))
        done += 1
        print(f"[{done}] {key}: {len(targets)} targets, fg voxels {int(masks.sum())}", flush=True)
    print(f"labeled {done} cases")


if __name__ == "__main__":
    main()
