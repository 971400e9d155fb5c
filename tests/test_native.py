"""Native C++ runtime tests: build, zstd, resize parity, prefetcher."""
import numpy as np
import pytest
import zstandard

from mmmm_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def _require_native():
    if not native.is_available():
        pytest.skip("native toolchain unavailable")


def test_zstd_roundtrip_and_interop():
    data = b"medical imaging " * 1000
    comp = native.zstd_compress(data, level=5)
    assert native.zstd_decompress(comp) == data
    # interop with the python zstandard library both ways
    assert zstandard.ZstdDecompressor().decompress(comp) == data
    comp_py = zstandard.ZstdCompressor(level=3).compress(data)
    assert native.zstd_decompress(comp_py) == data


def test_resize_trilinear_upsample_matches_jax():
    """Upsampling: identical to jax.image.resize (no anti-alias kernel active)."""
    from mmmm_tpu.data.transforms import resize_3d

    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, size=(2, 4, 10, 12), dtype=np.uint8)
    shape = (6, 20, 24)
    got = native.resize_trilinear_u8(vol, shape)
    want = resize_3d(vol.astype(np.float32) / 255.0, shape)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_resize_trilinear_matches_torch():
    """Both directions: matches torch trilinear (antialias=False), the MONAI
    semantics the reference pipeline uses (jax.image.resize anti-aliases on
    downsampling — a documented divergence of the jax path)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    vol = rng.integers(0, 255, size=(2, 6, 20, 24), dtype=np.uint8)
    for shape in ((4, 13, 11), (8, 30, 30)):
        got = native.resize_trilinear_u8(vol, shape)
        t = torch.from_numpy(vol.astype(np.float32) / 255.0)[None]
        want = F.interpolate(t, size=shape, mode="trilinear", align_corners=False)[0].numpy()
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_resize_identity():
    vol = np.arange(2 * 3 * 4 * 5, dtype=np.uint8).reshape(2, 3, 4, 5)
    out = native.resize_trilinear_u8(vol, (3, 4, 5))
    np.testing.assert_allclose(out, vol.astype(np.float32) / 255.0, atol=1e-6)


def test_prefetcher(tmp_path):
    paths = []
    contents = []
    comp = zstandard.ZstdCompressor()
    for i in range(6):
        data = bytes(np.random.default_rng(i).integers(0, 255, size=10000, dtype=np.uint8))
        p = tmp_path / f"f{i}.zst"
        p.write_bytes(comp.compress(data))
        paths.append(p)
        contents.append(data)
    # also a non-zstd file passes through raw
    raw = tmp_path / "raw.bin"
    raw.write_bytes(b"hello raw")

    pf = native.NativePrefetcher(n_threads=3)
    jobs = [pf.submit(p) for p in paths]
    raw_job = pf.submit(raw)
    for job, expect in zip(jobs, contents):
        assert pf.wait(job) == expect
    assert pf.wait(raw_job) == b"hello raw"
    with pytest.raises(IOError):
        pf.wait(pf.submit(tmp_path / "missing.zst"))
    pf.close()
