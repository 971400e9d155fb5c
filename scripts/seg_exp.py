#!/usr/bin/env python
"""Segmentation ablation harness: UNet baseline vs the SAM head.

Equivalent of the reference's ``scripts/_seg-exp/{base,unet,sam}.py`` — the
controlled experiment behind the architecture choice: train a plain 3-D UNet
or the text-prompted SAM head on one processed segmentation dataset and
report DiceFocal losses + per-class Dice on a held-out split.

    python scripts/seg_exp.py --model unet --data <processed/AMOS22> \
        --classes spleen liver --steps 2000 --patch 32 96 96

Patches are sampled foreground-biased from ``images.pt.zst``/``masks.pt.zst``
cases; validation runs full-volume on the (resized) training patch grid.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def load_cases(data_dir: Path, classes: list[str]):
    """[(image (C,D,H,W) f32 in [0,1], masks (K,D,H,W) bool)] per case."""
    from mmmm_tpu.data.sparse import Sparse
    from mmmm_tpu.utils import load_pt_zst

    cases = []
    for case_dir in sorted((data_dir / "data").iterdir()):
        sp_path = case_dir / "sparse.json"
        mask_path = case_dir / "masks.pt.zst"
        if not sp_path.exists() or not mask_path.exists():
            continue
        sp = Sparse.from_json(sp_path.read_bytes())
        img = np.asarray(load_pt_zst(case_dir / "images.pt.zst"), np.float32) / 255.0
        masks_all = np.asarray(load_pt_zst(mask_path))
        sem = np.zeros((len(classes), *img.shape[1:]), bool)
        found = False
        for targets in sp.targets.values():
            for t in targets:
                if t.name in classes and t.index_offset is not None:
                    lo, hi = t.index_offset
                    sem[classes.index(t.name)] |= masks_all[lo:hi].any(0)
                    found = True
        if found:
            cases.append((img, sem))
    return cases


def sample_patch(rng, image, masks, patch):
    """Foreground-biased patch crop (ref base.py patch sampling)."""
    shape = image.shape[1:]
    patch = tuple(min(p, s) for p, s in zip(patch, shape))
    if rng.random() < 0.5 and masks.any():
        k = rng.choice(np.nonzero(masks.any((1, 2, 3)))[0])
        zz, yy, xx = np.nonzero(masks[k])
        i = rng.integers(len(zz))
        center = (zz[i], yy[i], xx[i])
        lo = [int(np.clip(c - p // 2, 0, s - p)) for c, p, s in zip(center, patch, shape)]
    else:
        lo = [rng.integers(0, s - p + 1) for p, s in zip(patch, shape)]
    sl = tuple(slice(l, l + p) for l, p in zip(lo, patch))
    return image[(slice(None), *sl)], masks[(slice(None), *sl)]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", help="YAML experiment config "
                        "(conf/seg-exp/{unet,sam}.yaml — the reference's "
                        "experiment constants); CLI flags override it")
    parser.add_argument("--model", choices=["unet", "sam"])
    parser.add_argument("--data", help="processed dataset dir")
    parser.add_argument("--classes", nargs="+")
    parser.add_argument("--steps", type=int)
    parser.add_argument("--batch", type=int)
    parser.add_argument("--patch", type=int, nargs=3)
    parser.add_argument("--lr", type=float)
    parser.add_argument("--weight-decay", type=float, dest="weight_decay")
    parser.add_argument("--channels", type=int, nargs="+",
                        help="UNet encoder channels per stage")
    parser.add_argument("--val-frac", type=float, dest="val_frac")
    parser.add_argument("--seed", type=int)
    parser.add_argument("--out", help="JSON results path")
    parser.add_argument("--log-every", type=int, dest="log_every")
    args = parser.parse_args(argv)

    # config supplies defaults; explicit CLI flags win (ref seg-exp configs
    # /root/reference/conf/seg-exp/{unet,sam}.yaml are the experiment record)
    defaults = {
        "steps": 2000, "batch": 2, "patch": [32, 96, 96], "lr": 1e-3,
        "weight_decay": 5e-2, "channels": [16, 32, 64, 128],
        "val_frac": 0.2, "seed": 0, "log_every": 50,
    }
    if args.config:
        from mmmm_tpu.config import load_yaml

        defaults.update(load_yaml(args.config))
    for k, v in defaults.items():
        if getattr(args, k, None) is None:
            setattr(args, k, v)
    if args.model is None or args.data is None or args.classes is None:
        parser.error("--model, --data and --classes are required "
                     "(via flags or -c config)")

    import jax
    import jax.numpy as jnp
    import optax

    from mmmm_tpu.models.segvol import DiceFocalLoss

    classes = args.classes
    cases = load_cases(Path(args.data), classes)
    if len(cases) < 2:
        raise SystemExit(f"need >= 2 cases with {classes}, found {len(cases)}")
    n_val = max(1, int(len(cases) * args.val_frac))
    val_cases, train_cases = cases[:n_val], cases[n_val:]
    print(f"{len(train_cases)} train / {len(val_cases)} val cases")

    key = jax.random.PRNGKey(args.seed)
    loss_fn = DiceFocalLoss()
    if args.model == "unet":
        from mmmm_tpu.models.unet import init_unet_params, unet_forward

        params = init_unet_params(key, cases[0][0].shape[0], len(classes),
                                  channels=tuple(args.channels))

        def forward(params, image):
            return unet_forward(params, image)
    else:
        from mmmm_tpu.models.segvol import SamConfig, init_sam_params, sam_forward

        sam_kw = dict(
            in_channels=cases[0][0].shape[0], embed_dim=256,
            encoder_num_layers=6, encoder_num_heads=8,
            patch_size=(4, 16, 16), pos_embed_shape=(8, 8, 8),
        )
        # conf/seg-exp/sam.yaml can override the head architecture (ref
        # sam.yaml model.sam block: patch_size, pos_embed_shape, ...)
        sam_kw.update({
            k: tuple(v) if isinstance(v, list) else v
            for k, v in defaults.get("sam", {}).items()
        })
        cfg = SamConfig(**sam_kw)
        sam_params = init_sam_params(key, cfg)
        # one learned prompt per class (stage-0 style text-embedding stand-in)
        prompts = jax.random.normal(jax.random.fold_in(key, 1),
                                    (len(classes), cfg.embed_dim)) * 0.02
        params = {"sam": sam_params, "prompts": prompts}

        def forward(params, image):
            b = image.shape[0]
            pr = jnp.broadcast_to(params["prompts"][None], (b, *params["prompts"].shape))
            masks, _ = sam_forward(params["sam"], cfg, image, cfg.patch_size, pr)
            return masks

    tx = optax.adamw(optax.cosine_decay_schedule(args.lr, args.steps),
                     weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    def loss(params, image, target):
        logits = forward(params, image)
        per = loss_fn.per_channel(logits.astype(jnp.float32), target)
        return per.mean(), per

    @jax.jit
    def train_step(params, opt_state, image, target):
        (l, per), grads = jax.value_and_grad(loss, has_aux=True)(params, image, target)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    @jax.jit
    def val_dice(params, image, target):
        logits = forward(params, image)
        pred = jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
        inter = (pred & (target > 0.5)).sum((0, 2, 3, 4))
        denom = pred.sum((0, 2, 3, 4)) + (target > 0.5).sum((0, 2, 3, 4))
        return 2 * inter / jnp.clip(denom, 1)

    rng = np.random.default_rng(args.seed)
    patch = tuple(args.patch)
    for it in range(args.steps):
        imgs, tgts = [], []
        for _ in range(args.batch):
            img, msk = train_cases[rng.integers(len(train_cases))]
            pi, pm = sample_patch(rng, img, msk, patch)
            imgs.append(pi)
            tgts.append(pm.astype(np.float32))
        params, opt_state, l = train_step(
            params, opt_state, jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(tgts))
        )
        if it % args.log_every == 0:
            print(f"[{it}] loss={float(l):.4f}", flush=True)

    dices = []
    for img, msk in val_cases:
        pi, pm = sample_patch(rng, img, msk, patch)  # center-ish eval patch
        dices.append(np.asarray(val_dice(
            params, jnp.asarray(pi[None]), jnp.asarray(pm[None].astype(np.float32))
        )))
    per_class = np.stack(dices).mean(0)
    results = {
        "model": args.model,
        "dice": {c: round(float(d), 4) for c, d in zip(classes, per_class)},
        "mean_dice": round(float(per_class.mean()), 4),
    }
    print(json.dumps(results, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
