"""VL image compression pass (ref ``MIMIC-CXR-compress.py`` / ``RP-compress.py``)."""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, "scripts/data")


def test_compress_vl_end_to_end(tmp_path):
    import compress_vl

    from mmmm_tpu.utils import load_pt_zst

    from PIL import Image

    img_dir = tmp_path / "p10" / "p100" / "s1" / "img"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    arr = np.zeros((300, 700), np.uint8)
    arr[40:260, 60:600] = rng.integers(30, 255, (220, 540))
    Image.fromarray(arr).save(img_dir / "x.png")  # png: lossless, exact crop
    items = [{"image": [str(img_dir / "x.png")], "modality": ["X-Ray"], "findings": "f"}]
    (tmp_path / "train.json").write_text(json.dumps(items))
    out = tmp_path / "out"
    compress_vl.main(["--data", str(tmp_path), "--out", str(out), "--splits", "train"])

    res = json.loads((out / "train.json").read_text())
    assert len(res) == 1
    assert res[0]["modality"] == ["X-ray"]  # normalized
    vol = np.asarray(load_pt_zst(res[0]["image"][0]))
    # nonzero-cropped to the content box; z=1 keeps in-plane size under the cap
    assert vol.shape == (1, 1, 220, 540)
    assert vol.dtype == np.uint8

    # resume: second run reuses outputs (no error, same JSON)
    compress_vl.main(["--data", str(tmp_path), "--out", str(out), "--splits", "train"])
    assert json.loads((out / "train.json").read_text()) == res


def test_get_resize_token_budget():
    import compress_vl

    # deep volume: z caps at 4*32=128 slices, in-plane edge caps at 256
    assert compress_vl.get_resize((300, 640, 640)) == [128, 256, 256]
    # thin image: z=1 -> cap sqrt(256)*32 = 512
    assert compress_vl.get_resize((1, 400, 800)) == [1, 400, 800]
    assert compress_vl.get_resize((1, 600, 1200)) == [1, 512, 1024]
