#!/usr/bin/env python
"""Stage-0 SAM alignment CLI (``scripts/align-sam/cli.py`` equivalent).

Trains the SAM (or instance-SAM) head against frozen text-prompt embeddings
over patch-sampled local datasets, before LLM coupling.

    python scripts/align_sam.py -c conf/align-sam/fit.yaml [k=v ...]

Config keys: sam (SamConfig), align (AlignTransConf), data.datasets (local
dirs), class_embeddings (npz: {class_name: (C,)}; random-init when absent),
optimizer, trainer {max_steps, batch_size, out_dir, ...}.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--instance", action="store_true")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from mmmm_tpu.config import apply_overrides, build, load_yaml, resolve_interpolations
    from mmmm_tpu.data.align import AlignPatchTransform, AlignTransConf, collate_align
    from mmmm_tpu.data.local import get_local_data_list
    from mmmm_tpu.models.align import AlignConfig, align_training_step
    from mmmm_tpu.models.segvol import SamConfig, init_sam_params
    from mmmm_tpu.train import OptimizerConfig, make_optimizer
    from mmmm_tpu.train.checkpoint import save_adapter

    cfg = resolve_interpolations(apply_overrides(load_yaml(args.config, resolve=False), args.overrides))
    sam_cfg = build(SamConfig, cfg.get("sam") or {})
    align_tc = build(AlignTransConf, cfg.get("align") or {})
    trainer_cfg = cfg.get("trainer") or {}
    max_steps = trainer_cfg.get("max_steps", 1000)
    batch_size = trainer_cfg.get("batch_size", 4)
    out_dir = Path(trainer_cfg.get("out_dir", "runs/align-sam"))
    out_dir.mkdir(parents=True, exist_ok=True)

    # datasets + class index: specs are {name, weight?, dir?}; dir defaults to
    # the processed-local root / name, and (like the trainer CLI) datasets
    # without processed data on disk are skipped so the full reference roster
    # (conf/align-sam/data.yaml, 41 datasets) ships in the config
    from mmmm_tpu.data.defs import PROCESSED_LOCAL_DATA_ROOT

    data_cfg = cfg.get("data") or {}
    skip_missing = bool(data_cfg.get("skip_missing", True))
    ds_lists, ds_weights, skipped = [], [], []
    for spec in data_cfg.get("datasets", []):
        d = Path(spec["dir"]) if spec.get("dir") else PROCESSED_LOCAL_DATA_ROOT / spec["name"]
        if skip_missing and not d.exists():
            skipped.append(spec.get("name", str(d)))
            continue
        ds_lists.append(get_local_data_list(d))
        ds_weights.append(float(spec.get("weight", 1.0)))
    if skipped:
        print(f"skipping {len(skipped)} dataset(s) without processed data: "
              f"{', '.join(skipped)}", flush=True)
    data_lists = [item for dl in ds_lists for item in dl]
    if not data_lists:
        raise SystemExit("no datasets configured (data.datasets[].{name|dir})")
    from mmmm_tpu.data.sparse import Sparse

    names = set()
    for item in data_lists:
        sp = Sparse.from_json((Path(item["dataset_dir"]) / "data" / item["key"] / "sparse.json").read_bytes())
        names |= {t.name for ts in sp.targets.values() for t in ts}
        names |= {n for ns in sp.neg_targets.values() for n in ns}
    class_to_idx = {n: i for i, n in enumerate(sorted(names))}
    # per-case multinomial weights: dataset probability = weight * len
    # (matching the trainer's WeightedMultiDatasetSampler semantics)
    case_w = np.concatenate([np.full(len(dl), w) for dl, w in zip(ds_lists, ds_weights)])
    case_p = case_w / case_w.sum()
    print(f"{len(data_lists)} cases, {len(class_to_idx)} classes", flush=True)

    # frozen class embeddings (from a text encoder dump, else random)
    emb_path = cfg.get("class_embeddings")
    if emb_path:
        loaded = np.load(emb_path)
        embeds = np.stack([loaded[n] for n in sorted(names)])
    else:
        embeds = np.random.default_rng(0).normal(size=(len(class_to_idx), sam_cfg.embed_dim)) * 0.02
    embeds = jnp.asarray(embeds, jnp.float32)

    align_cfg = AlignConfig(sam=sam_cfg, instance=args.instance)
    params = init_sam_params(jax.random.PRNGKey(0), sam_cfg, instance=args.instance)
    optimizer = make_optimizer(build(OptimizerConfig, cfg.get("optimizer") or {"lr": 2e-4}))
    opt_state = optimizer.init(params)
    tf = AlignPatchTransform(align_tc, class_to_idx, seed=0)
    patch_vit = tuple(cfg.get("vit_patch_size", (align_tc.patch_size_z, 16, 16)))

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            return align_training_step(p, align_cfg, embeds, {**batch, "patch_size": patch_vit})

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state2, logs

    rng = np.random.default_rng(0)
    log_file = (out_dir / "metrics.jsonl").open("a")
    t0 = time.time()
    for it in range(1, max_steps + 1):
        picks = rng.choice(len(data_lists), batch_size, p=case_p)
        batch = collate_align([tf(data_lists[i]) for i in picks])
        batch = {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)}
        params, opt_state, logs = step(params, opt_state, batch)
        if it % trainer_cfg.get("log_every", 50) == 0 or it == max_steps:
            rec = {"step": it, **{k: float(v) for k, v in jax.device_get(logs).items()},
                   "sec": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
            log_file.write(json.dumps(rec) + "\n")
            log_file.flush()
    save_adapter(out_dir / "sam_aligned.npz", jax.device_get(params))
    print(f"saved {out_dir / 'sam_aligned.npz'}")


if __name__ == "__main__":
    main()
