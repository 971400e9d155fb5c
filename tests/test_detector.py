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
    i_nod = VINDR_CLASSES.index("lung nodule")
    logits[0, i_card] = 2.0  # high score
    logits[1, i_eff] = -4.0  # low but present -> fallback best-of-class
    logits[2, i_nod] = 3.0  # high score but NOT tagged -> dropped
    out = select_boxes(logits, boxes, ["cardiomegaly", "pleural effusion"], (100, 200))
    assert set(out) == {"cardiomegaly", "pleural effusion"}
    # absolute xyxy in (w=200, h=100) pixel space
    assert out["cardiomegaly"][0] == pytest.approx([80.0, 40.0, 120.0, 60.0])
    assert "lung nodule" not in out


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


def test_compute_map_perfect_and_degraded():
    from mmmm_tpu.models.detector import compute_map

    gt = [{"boxes": np.asarray([[10, 10, 30, 30], [40, 40, 60, 60]], np.float64),
           "classes": np.asarray([0, 1])}]
    perfect = [{"boxes": gt[0]["boxes"].copy(), "scores": np.asarray([0.9, 0.8]),
                "classes": np.asarray([0, 1])}]
    assert compute_map(perfect, gt, num_classes=2) == 1.0
    # wrong classes -> zero
    wrong = [{"boxes": gt[0]["boxes"].copy(), "scores": np.asarray([0.9, 0.8]),
              "classes": np.asarray([1, 0])}]
    assert compute_map(wrong, gt, num_classes=2) == 0.0
    # one hit one miss + a false positive ranked first for class 0
    mixed = [{"boxes": np.asarray([[200, 200, 220, 220], [10, 10, 30, 30]], np.float64),
              "scores": np.asarray([0.95, 0.9]), "classes": np.asarray([0, 0])}]
    ap = compute_map(mixed, gt, num_classes=2)
    assert 0.0 < ap < 1.0


def test_stage3_detector_boxes_feed_grg_train_step(tmp_path):
    """The full stage-3 data story (VERDICT r2 #6): train the detector on a
    synthetic VinDr-scale set (mAP logged), infer boxes for tagged reports,
    and drive the resulting {key}_box.json through GRGTransform into an
    instance-mode train step."""
    import sys

    sys.path.insert(0, "scripts/data")
    import detector as det_cli

    from mmmm_tpu.data.sparse import Sparse, Target
    from mmmm_tpu.utils import save_pt_zst

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "proc" / "data"
    # VinDr-style fused-box set: 8 cases, 2 classes with distinct geometry
    for k in range(8):
        case = data_dir / f"case{k}"
        case.mkdir(parents=True)
        img = np.zeros((1, 1, 64, 80), np.uint8)
        img[0, 0, 8:28, 16:48] = 200  # cardiomegaly blob
        img[0, 0, 40:52, 56:72] = 120  # nodule blob
        save_pt_zst(img, case / "images.pt.zst")
        sp = Sparse(
            spacing=np.ones(3), shape=np.asarray([1, 64, 80]), modalities=["X-ray"],
            targets={"anomaly": [
                Target("cardiomegaly", False, boxes=np.asarray([[0, 8, 16, 1, 28, 48]], np.int64)),
                Target("lung nodule", False, boxes=np.asarray([[0, 40, 56, 1, 52, 72]], np.int64)),
            ], "anatomy": []},
            neg_targets={"anatomy": [], "anomaly": []},
            mean=np.asarray([30.0], np.float32), std=np.asarray([60.0], np.float32),
            complete_anomaly=True,
        )
        (case / "sparse.json").write_bytes(sp.to_json())

    ckpt = tmp_path / "ckpt"
    det_cli.main([
        "train", "--data", str(tmp_path / "proc"), "--out", str(ckpt),
        "--steps", "4", "--batch", "2", "--size", "64", "--layers", "1",
        "--queries", "8", "--log-every", "2", "--eval-frac", "0.25",
    ])

    # tagged "MIMIC" studies -> detector boxes in the grg dataset dir
    from PIL import Image

    grg_dir = tmp_path / "GRGSet"
    grg_dir.mkdir()
    report = "There is cardiomegaly and a lung nodule ."
    items = []
    for k in range(2):
        key = f"study{k}"
        arr = np.zeros((64, 80), np.uint8)
        arr[8:28, 16:48] = 200
        arr[40:52, 56:72] = 120
        Image.fromarray(arr).save(grg_dir / f"{key}.png")
        items.append({
            "key": key, "image": [f"{key}.png"], "plane": ["PA"],
            "ref_report": report,
            "tags": [
                {"start": 9, "end": 21, "target": "cardiomegaly"},
                {"start": 28, "end": 39, "target": "lung nodule"},
            ],
        })
    assert report[9:21] == "cardiomegaly" and report[28:39] == "lung nodule"
    (grg_dir / "train.json").write_text(json.dumps(items))
    det_cli.main([
        "infer", "--ckpt", str(ckpt), "--tags", str(grg_dir / "train.json"),
        "--images", str(grg_dir), "--out", str(grg_dir),
        "--size", "64", "--layers", "1", "--queries", "8",
    ])
    assert (grg_dir / "study0_box.json").exists()

    # grg transform -> batch -> instance train step
    import jax

    from mmmm_tpu.data import MMMMTokenizer
    from mmmm_tpu.data.batching import BucketBatcher
    from mmmm_tpu.data.grg import GRGTransConf, GRGTransform, get_grg_data_list
    from mmmm_tpu.data.local import DatasetConf
    from mmmm_tpu.models import MMMMConfig, MMMMModel
    from mmmm_tpu.peft import LoraConfig
    from mmmm_tpu.train import (
        OptimizerConfig, init_train_state, make_optimizer, make_train_step,
    )

    tok = MMMMTokenizer.byte_fallback()
    conf = DatasetConf(
        base_vit_patch_size_z=4, vit_patch_size_xy=4, pool_size_xy=1,
        base_pool_size_z=1, max_seq_len=768, max_targets=4, max_instances=8,
    )
    conf.grg_trans = GRGTransConf(max_tokens=64, max_tokens_z=4, grounding_prob=1.0)
    tf = GRGTransform(conf, tok, seed=0)
    points = [tf(item) for item in get_grg_data_list(grg_dir)]
    assert any(p["grounding"] and p["instance"] for p in points)
    batcher = BucketBatcher(2, eop_token_id=tok.eop_token_id, max_targets=4,
                            max_instances=8, max_seq_len=768)
    batches = list(batcher(iter(points)))
    inst = [b for b in batches if b["vg_mode"] == "instance"]
    assert inst, [b["vg_mode"] for b in batches]

    model = MMMMModel(MMMMConfig.tiny())
    opt = make_optimizer(OptimizerConfig(lr=1e-3, warmup_steps=1, max_steps=10))
    state, frozen = init_train_state(jax.random.PRNGKey(0), model, opt, LoraConfig(r=2))
    step = make_train_step(model, opt, LoraConfig(r=2), vg_mode="instance",
                           attn_impl="xla", remat=False)
    batch = dict(inst[0])
    batch.pop("vg_mode"), batch.pop("src")
    state, logs = step(state, frozen, batch)
    assert np.isfinite(float(logs["loss"]))
    assert "vg_loss" in logs
