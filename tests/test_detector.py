"""Pseudo-box detector: LAP matcher, loss descent, select_instances contract
(ref ``scripts/data/vg/MIMIC-CXR/detrex/tools/MIMIC-CXR-vg/infer.py``)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.models.detector import (
    VINDR_CLASSES,
    DetectorConfig,
    detector_forward,
    detector_loss,
    equalize_image,
    init_detector_params,
    select_boxes,
)
from mmmm_tpu.ops.hungarian import lap_rectangular


def _tiny_cfg():
    return DetectorConfig(
        num_classes=4, d_model=32, n_heads=4, n_points=2,
        enc_layers=1, dec_layers=2, ffn_dim=64, num_queries=12,
        backbone_dims=(8, 16, 32, 32), image_size=64, max_gt=4,
    )


def test_lap_rectangular_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(7)
    for _ in range(10):
        k = rng.integers(1, 9)
        q = rng.integers(k, 40)
        c = rng.normal(size=(k, q))
        got = np.asarray(jax.jit(lap_rectangular)(jnp.asarray(c)))
        r, col = linear_sum_assignment(c)
        assert len(set(got.tolist())) == k
        assert c[np.arange(k), got].sum() == pytest.approx(c[r, col].sum(), abs=1e-6)


def test_detector_forward_shapes():
    cfg = _tiny_cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images = jnp.zeros((2, cfg.image_size, cfg.image_size, 1))
    out = jax.jit(lambda im: detector_forward(params, cfg, im))(images)
    assert out["class_logits"].shape == (2, cfg.num_queries, cfg.num_classes)
    assert out["boxes"].shape == (2, cfg.num_queries, 4)
    assert len(out["aux"]) == cfg.dec_layers - 1
    b = np.asarray(out["boxes"])
    assert (b >= 0).all() and (b <= 1).all()


def test_detector_loss_decreases():
    cfg = _tiny_cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    # one bright box per image on dark background; GT follows the box
    images = np.zeros((2, cfg.image_size, cfg.image_size, 1), np.float32)
    gt_boxes = np.zeros((2, cfg.max_gt, 4), np.float32)
    gt_classes = np.zeros((2, cfg.max_gt), np.int32)
    gt_valid = np.zeros((2, cfg.max_gt), bool)
    for i in range(2):
        x0, y0 = rng.integers(5, 25, 2)
        wd, ht = rng.integers(12, 30, 2)
        images[i, y0 : y0 + ht, x0 : x0 + wd, 0] = 1.0
        s = cfg.image_size
        gt_boxes[i, 0] = [(x0 + wd / 2) / s, (y0 + ht / 2) / s, wd / s, ht / s]
        gt_classes[i, 0] = i + 1
        gt_valid[i, 0] = True
    batch = tuple(map(jnp.asarray, (images, gt_boxes, gt_classes, gt_valid)))

    import optax

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(detector_loss)(params, cfg, *batch)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[::6]


def test_select_boxes_reference_semantics():
    q, c = 20, len(VINDR_CLASSES)
    logits = np.full((q, c), -8.0)
    boxes = np.tile([0.5, 0.5, 0.2, 0.2], (q, 1)).astype(np.float32)
    i_card = VINDR_CLASSES.index("cardiomegaly")
    i_eff = VINDR_CLASSES.index("pleural effusion")
    i_nod = VINDR_CLASSES.index("nodule")
    logits[0, i_card] = 2.0  # high score
    logits[1, i_eff] = -4.0  # low but present -> fallback best-of-class
    logits[2, i_nod] = 3.0  # high score but NOT tagged -> dropped
    out = select_boxes(logits, boxes, ["cardiomegaly", "pleural effusion"], (100, 200))
    assert set(out) == {"cardiomegaly", "pleural effusion"}
    # absolute xyxy in (w=200, h=100) pixel space
    assert out["cardiomegaly"][0] == pytest.approx([80.0, 40.0, 120.0, 60.0])
    assert "nodule" not in out


def test_equalize_matches_torchvision():
    torch = pytest.importorskip("torch")
    tvtf = pytest.importorskip("torchvision.transforms.v2.functional")

    rng = np.random.default_rng(0)
    img = (rng.beta(2, 5, (32, 48)) * 255).astype(np.uint8)
    ours = equalize_image(img)
    theirs = tvtf.equalize(torch.from_numpy(img)[None]).numpy()[0]
    np.testing.assert_array_equal(ours, theirs)


def test_detector_cli_train_and_infer(tmp_path):
    """End-to-end: synthetic processed VinDr dir -> short train -> infer writes
    the {key}_box.json grg contract."""
    import sys

    sys.path.insert(0, "scripts/data")
    import detector as det_cli

    from mmmm_tpu.data.sparse import Sparse, Target
    from mmmm_tpu.utils import save_pt_zst

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "proc" / "data"
    for k in range(3):
        case = data_dir / f"case{k}"
        case.mkdir(parents=True)
        img = np.zeros((1, 1, 64, 80), np.uint8)
        img[0, 0, 10:30, 20:50] = 200
        save_pt_zst(img, case / "images.pt.zst")
        sp = Sparse(
            spacing=np.ones(3), shape=np.asarray([1, 64, 80]), modalities=["X-ray"],
            mean=np.asarray([30.0], np.float32), std=np.asarray([60.0], np.float32),
            targets={"anomaly": [Target(
                name="cardiomegaly", semantic=False,
                boxes=np.asarray([[0, 10, 20, 1, 30, 50]], np.int64),
            )], "anatomy": []},
            neg_targets={"anatomy": [], "anomaly": []},
            complete_anomaly=True,
        )
        (case / "sparse.json").write_bytes(sp.to_json())

    ckpt = tmp_path / "ckpt"
    det_cli.main([
        "train", "--data", str(tmp_path / "proc"), "--out", str(ckpt),
        "--steps", "2", "--batch", "2", "--size", "64", "--layers", "1",
        "--queries", "8", "--log-every", "1",
    ])
    assert (ckpt / "params.npz").exists()

    # tags JSON + a png image for inference
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    arr = np.zeros((64, 80), np.uint8)
    arr[10:30, 20:50] = 180
    Image.fromarray(arr).save(img_dir / "study1.png")
    tags = [{"image": ["study1.png"], "tags": [{"target": "cardiomegaly"}]}]
    (tmp_path / "tags.json").write_text(json.dumps(tags))
    out_dir = tmp_path / "boxes"
    det_cli.main([
        "infer", "--ckpt", str(ckpt), "--tags", str(tmp_path / "tags.json"),
        "--images", str(img_dir), "--out", str(out_dir),
        "--size", "64", "--layers", "1", "--queries", "8",
    ])
    box_json = json.loads((out_dir / "study1_box.json").read_text())
    for name, bxs in box_json.items():
        assert name in VINDR_CLASSES
        for b in bxs:
            assert len(b) == 4
            assert 0 <= b[0] <= b[2] <= 80 and 0 <= b[1] <= b[3] <= 64
