"""Segmentation ablation harness (ref ``scripts/_seg-exp/{base,unet,sam}.py``):
UNet baseline trains on a synthetic processed dataset and reports Dice."""
import json
import sys

import numpy as np

sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp

from mmmm_tpu.models.unet import init_unet_params, unet_forward


def test_unet_forward_shapes():
    params = init_unet_params(jax.random.PRNGKey(0), 1, 3, channels=(4, 8, 16))
    logits = jax.jit(lambda im: unet_forward(params, im))(jnp.zeros((2, 1, 8, 32, 32)))
    assert logits.shape == (2, 3, 8, 32, 32)
    assert np.isfinite(np.asarray(logits)).all()


def _write_dataset(root, n_cases=3):
    from mmmm_tpu.data.sparse import Sparse, Target
    from mmmm_tpu.utils import save_pt_zst

    rng = np.random.default_rng(0)
    for k in range(n_cases):
        case = root / "data" / f"c{k}"
        case.mkdir(parents=True)
        img = np.zeros((1, 8, 32, 32), np.uint8)
        mask = np.zeros((1, 8, 32, 32), bool)
        mask[0, 2:6, 8:24, 8:24] = True
        img[0][mask[0]] = 200
        img = img + rng.integers(0, 20, img.shape).astype(np.uint8)
        save_pt_zst(img, case / "images.pt.zst")
        save_pt_zst(mask, case / "masks.pt.zst")
        sp = Sparse(
            spacing=np.ones(3), shape=np.asarray([8, 32, 32]), modalities=["CT"],
            mean=np.asarray([50.0], np.float32), std=np.asarray([60.0], np.float32),
            targets={"anatomy": [Target(name="spleen", semantic=True,
                                        index_offset=(0, 1))], "anomaly": []},
            neg_targets={"anatomy": [], "anomaly": []},
            complete_anomaly=False,
        )
        (case / "sparse.json").write_bytes(sp.to_json())


def test_seg_exp_unet_end_to_end(tmp_path):
    import seg_exp

    _write_dataset(tmp_path)
    out = tmp_path / "res.json"
    seg_exp.main([
        "--model", "unet", "--data", str(tmp_path), "--classes", "spleen",
        "--steps", "3", "--batch", "1", "--patch", "8", "32", "32",
        "--out", str(out), "--log-every", "1",
    ])
    res = json.loads(out.read_text())
    assert res["model"] == "unet"
    assert "spleen" in res["dice"]
    assert 0.0 <= res["mean_dice"] <= 1.0


def test_seg_exp_sam_config_driven(tmp_path):
    """The -c config path: conf/seg-exp/sam.yaml supplies the experiment
    constants (ref conf/seg-exp/sam.yaml) and CLI flags override the heavy
    ones down to smoke size; the sam: block reshapes the head."""
    import seg_exp

    _write_dataset(tmp_path)
    out = tmp_path / "res.json"
    cfg = tmp_path / "sam.yaml"
    cfg.write_text(
        "model: sam\nlr: 1.0e-4\nweight_decay: 5.0e-2\n"
        "sam:\n  patch_size: [4, 16, 16]\n  pos_embed_shape: [2, 2, 2]\n"
        "  embed_dim: 32\n  encoder_num_layers: 1\n  encoder_num_heads: 2\n"
    )
    seg_exp.main([
        "-c", str(cfg), "--data", str(tmp_path), "--classes", "spleen",
        "--steps", "2", "--batch", "1", "--patch", "8", "32", "32",
        "--out", str(out), "--log-every", "1",
    ])
    res = json.loads(out.read_text())
    assert res["model"] == "sam"
    assert 0.0 <= res["mean_dice"] <= 1.0


def test_seg_exp_shipped_configs_parse():
    """The shipped conf/seg-exp/*.yaml carry the reference experiment
    constants (ref conf/seg-exp/{unet,sam}.yaml: 60k steps, batch 8,
    lr 3e-4/1e-4, wd 5e-2)."""
    from mmmm_tpu.config import load_yaml

    unet = load_yaml("conf/seg-exp/unet.yaml")
    assert unet["model"] == "unet" and unet["steps"] == 60000
    assert unet["lr"] == 3e-4 and unet["batch"] == 8
    sam = load_yaml("conf/seg-exp/sam.yaml")
    assert sam["model"] == "sam" and sam["lr"] == 1e-4
    assert tuple(sam["sam"]["patch_size"]) == (8, 16, 16)
