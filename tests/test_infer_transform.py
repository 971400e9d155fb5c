"""Inference-time image transform tests."""
import numpy as np

from mmmm_tpu.data.infer_transform import image_transform
from mmmm_tpu.data.local import DatasetConf, LocalTransConf


def _conf():
    return DatasetConf(
        base_vit_patch_size_z=4, vit_patch_size_xy=4, pool_size_xy=1, base_pool_size_z=1,
        local_trans=LocalTransConf(max_vision_tokens=64, max_tokens_z=4),
    )


def test_image_transform_2d_array():
    img = np.random.default_rng(0).integers(0, 255, size=(1, 1, 100, 80), dtype=np.uint8)
    image, gimage, patch, pool, n = image_transform(img, _conf())
    assert image.shape[0] == 3
    assert image.shape[1] == 1  # 2-D stays depth-1
    grid = [s // (p * q) for s, p, q in zip(image.shape[1:], patch, pool)]
    assert n == int(np.prod(grid)) and n <= 64
    # grounding image is min-max (unnormalized), vlm image is CLIP-normalized
    assert gimage.min() >= 0.0 and gimage.max() <= 1.0
    assert image.min() < 0.0


def test_image_transform_3d_volume():
    vol = np.random.default_rng(1).integers(0, 255, size=(1, 24, 64, 64), dtype=np.uint8)
    image, _, patch, pool, n = image_transform(vol, _conf())
    assert patch[0] > 1  # thick volume gets z patching
    assert n <= 64


def test_image_transform_deterministic():
    img = np.random.default_rng(2).integers(0, 255, size=(1, 1, 50, 50), dtype=np.uint8)
    a = image_transform(img, _conf())
    b = image_transform(img, _conf())
    np.testing.assert_array_equal(a[0], b[0])
    assert a[2] == b[2] and a[4] == b[4]
