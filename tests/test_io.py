"""Array container IO tests (.pt.zst torch-compat + native .arr.zst)."""
import numpy as np

from mmmm_tpu.utils import load_array_zst, load_pt_zst, save_array_zst, save_pt_zst


def test_pt_zst_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    obj = {
        "images": (rng.uniform(0, 255, size=(2, 4, 8, 8))).astype(np.uint8),
        "nested": {"masks": rng.uniform(size=(3, 4, 8, 8)) > 0.5},
        "meta": "key-1",
    }
    save_pt_zst(obj, tmp_path / "x.pt.zst")
    back = load_pt_zst(tmp_path / "x.pt.zst")
    np.testing.assert_array_equal(back["images"], obj["images"])
    np.testing.assert_array_equal(back["nested"]["masks"], obj["nested"]["masks"])
    assert back["meta"] == "key-1"


def test_pt_zst_reads_reference_format(tmp_path):
    """Files written by torch.save + zstd (the reference pipeline) load fine."""
    import io

    import torch
    import zstandard

    t = torch.arange(24, dtype=torch.int16).reshape(2, 3, 4)
    buf = io.BytesIO()
    torch.save(t, buf)
    (tmp_path / "ref.pt.zst").write_bytes(zstandard.ZstdCompressor().compress(buf.getvalue()))
    back = load_pt_zst(tmp_path / "ref.pt.zst")
    np.testing.assert_array_equal(back, t.numpy())


def test_arr_zst_roundtrip(tmp_path):
    for dtype in (np.uint8, np.float32, np.int64, np.bool_):
        arr = (np.random.default_rng(1).uniform(0, 100, size=(3, 5, 7))).astype(dtype)
        save_array_zst(arr, tmp_path / "a.arr.zst")
        back = load_array_zst(tmp_path / "a.arr.zst")
        np.testing.assert_array_equal(back, arr)
        assert back.dtype == arr.dtype
