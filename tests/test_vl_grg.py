"""VL and GRG transform tests with synthetic on-disk datasets."""
import json

import numpy as np
import pytest
from PIL import Image

from mmmm_tpu.data import MMMMTokenizer
from mmmm_tpu.data.batching import BucketBatcher
from mmmm_tpu.data.grg import GRGTransConf, GRGTransform, equalize_uint8, get_grg_data_list
from mmmm_tpu.data.local import DatasetConf
from mmmm_tpu.data.vl import VLTransConf, VLTransform, get_vl_data_list
from mmmm_tpu.utils import save_pt_zst


def _conf(**kw):
    conf = DatasetConf(
        base_vit_patch_size_z=4, vit_patch_size_xy=4, pool_size_xy=1,
        base_pool_size_z=1, max_seq_len=768, max_targets=4, max_instances=8,
    )
    conf.vl_trans = VLTransConf(max_tokens=64, max_tokens_z=4, **kw.get("vl", {}))
    conf.grg_trans = GRGTransConf(max_tokens=64, max_tokens_z=4, **kw.get("grg", {}))
    return conf


@pytest.fixture(scope="module")
def vl_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("MIMIC-CXR")
    img_dir = root / "images"
    img_dir.mkdir()
    items = []
    rng = np.random.default_rng(0)
    for i in range(3):
        p = img_dir / f"img{i}.png"
        Image.fromarray(rng.integers(0, 255, size=(64, 48), dtype=np.uint8).copy(), "L").save(p)
        items.append({
            "key": f"s{i}",
            "image": [str(p)],
            "plane": ["PA"],
            "modality": ["X-ray"],
            "processed_report": f"Findings: clear lungs, case {i}. Impression: normal.",
            "anomaly_pos": [],
            "anomaly_neg": ["pleural effusion"],
            "vqa": [{"question": "Is there effusion?", "answer": "No."}],
        })
    (root / "train-processed.json").write_text(json.dumps(items))
    return root


def test_vl_transform(vl_dataset):
    tok = MMMMTokenizer.byte_fallback()
    tf = VLTransform(_conf(), tok, seed=0)
    items = get_vl_data_list(vl_dataset)
    assert len(items) == 3
    dp = tf(items[0])
    assert dp["image"].shape[0] == 3
    assert dp["vlm_inputs"].labels is not None
    assert not dp["grounding"]
    n_vis = int((dp["vlm_inputs"].token_type_ids == 1).sum()) - 2
    grid = [s // (p * q) for s, p, q in zip(dp["image"].shape[1:], dp["patch_size"], dp["pool_size"])]
    assert n_vis == int(np.prod(grid))


@pytest.fixture(scope="module")
def grg_box_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("MIMIC-CXR")
    rng = np.random.default_rng(1)
    items = []
    for i in range(2):
        key = f"study{i}"
        img = rng.integers(0, 255, size=(96, 96), dtype=np.uint8)
        Image.fromarray(img.copy(), "L").save(root / f"{key}.jpg")
        report = "There is a nodule in the right lung and cardiomegaly is seen."
        #         0123456789...
        tags = [
            {"start": 11, "end": 17, "target": "nodule"},        # "nodule"
            {"start": 40, "end": 52, "target": "cardiomegaly"},  # "cardiomegaly"
        ]
        assert report[11:17] == "nodule" and report[40:52] == "cardiomegaly"
        (root / f"{key}_box.json").write_text(json.dumps({
            "nodule": [[10.0, 12.0, 30.0, 40.0]],
            "cardiomegaly": [[20.0, 50.0, 60.0, 90.0], [5.0, 5.0, 15.0, 20.0]],
        }))
        items.append({
            "key": key,
            "image": [f"{key}.jpg"],
            "plane": ["PA"],
            "ref_report": report,
            "tags": tags,
        })
    (root / "train.json").write_text(json.dumps(items))
    return root


def test_grg_transform_boxes(grg_box_dataset):
    tok = MMMMTokenizer.byte_fallback()
    conf = _conf(grg={"grounding_prob": 1.0, "equalize": True})
    tf = GRGTransform(conf, tok, seed=0)
    items = get_grg_data_list(grg_box_dataset)
    dp = tf(items[0])
    assert dp["instance"] and dp["grounding"]
    # two tags -> two targets, three boxes total
    assert dp["index_offsets"].shape == (2, 2)
    assert len(dp["boxes"]) == 3
    assert (dp["boxes"] >= 0).all() and (dp["boxes"] <= 1).all()
    # report contains injected <p> tags around both phrases
    ids = dp["vlm_inputs"].input_ids
    assert (ids == tok.bop_token_id).sum() == 2
    assert (ids == tok.eop_token_id).sum() == 2
    # batches assemble
    batcher = BucketBatcher(2, eop_token_id=tok.eop_token_id, max_targets=4, max_instances=8, max_seq_len=768)
    batches = list(batcher([tf(d) for d in items]))
    assert any(b["vg_mode"] == "instance" for b in batches)
    b = [b for b in batches if b["vg_mode"] == "instance"][0]
    assert b["vg_valid"][0, :2].all()


@pytest.fixture(scope="module")
def grg_seg_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("CT-RATE")
    rng = np.random.default_rng(2)
    key = "vol0"
    vol = rng.integers(0, 255, size=(1, 8, 48, 48), dtype=np.uint8)
    save_pt_zst(vol, root / f"{key}.pt.zst")
    seg = np.zeros((2, 8, 48, 48), bool)
    seg[0, 2:4, 10:20, 10:20] = True
    seg[1, 5:7, 30:40, 30:40] = True
    save_pt_zst(seg, root / f"{key}_seg.pt.zst")
    (root / f"{key}_seg.json").write_text(json.dumps(["liver", "nodule"]))
    report = "The liver is normal. A nodule is present."
    tags = [
        {"start": 4, "end": 9, "target": "liver"},
        {"start": 23, "end": 29, "target": "nodule"},
    ]
    assert report[4:9] == "liver" and report[23:29] == "nodule"
    (root / "train.json").write_text(json.dumps([
        {"key": key, "image": [f"{key}.pt.zst"], "ref_report": report, "tags": tags}
    ]))
    return root


def test_grg_transform_masks(grg_seg_dataset):
    tok = MMMMTokenizer.byte_fallback()
    conf = _conf(grg={"grounding_prob": 1.0})
    tf = GRGTransform(conf, tok, seed=0)
    items = get_grg_data_list(grg_seg_dataset)
    dp = tf(items[0])
    assert not dp["instance"]
    assert dp["masks"] is not None and dp["masks"].shape[0] == 2
    assert dp["masks"].shape[1:] == dp["image"].shape[1:]
    assert dp["masks"].any()


def test_equalize_uint8():
    img = np.full((1, 1, 8, 8), 100, np.uint8)
    out = equalize_uint8(img)
    assert out.shape == img.shape  # constant image unchanged-ish path
    rng = np.random.default_rng(0)
    img2 = rng.integers(100, 130, size=(1, 1, 64, 64), dtype=np.uint8)
    out2 = equalize_uint8(img2)
    # equalization stretches the narrow range
    assert out2.max() - out2.min() > img2.max() - img2.min()
