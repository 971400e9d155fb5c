"""NIfTI IO + processor pipeline tests, and processed-output -> LocalTransform interop."""
import json

import numpy as np
import pytest

from mmmm_tpu.preprocess import NiftiImage, read_nifti, write_nifti
from mmmm_tpu.preprocess.processor import NNUNetProcessor, ProcessorConfig, reorient_to_dhw


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for dtype in (np.uint8, np.int16, np.float32):
        data = rng.uniform(0, 100, size=(7, 9, 5)).astype(dtype)
        affine = np.diag([1.5, 0.7, 0.7, 1.0])
        affine[:3, 3] = [10, -5, 3]
        for name in ("x.nii", "x.nii.gz"):
            write_nifti(tmp_path / name, data, affine)
            img = read_nifti(tmp_path / name)
            np.testing.assert_array_equal(img.data, data)
            np.testing.assert_allclose(img.affine, affine, atol=1e-5)
            np.testing.assert_allclose(img.spacing, [1.5, 0.7, 0.7], atol=1e-5)


def test_reorient_puts_thick_axis_first():
    data = np.zeros((4, 8, 16))
    affine = np.diag([0.5, 3.0, 1.0, 1.0])  # axis 1 has the largest spacing
    out, spacing = reorient_to_dhw(data, affine)
    assert out.shape == (8, 16, 4)
    np.testing.assert_allclose(spacing, [3.0, 1.0, 0.5])


def _make_nnunet_dataset(root, n_cases=2):
    (root / "imagesTr").mkdir(parents=True)
    (root / "labelsTr").mkdir()
    rng = np.random.default_rng(0)
    for i in range(n_cases):
        vol = rng.normal(100, 20, size=(20, 24, 10)).astype(np.float32)
        seg = np.zeros((20, 24, 10), np.int16)
        seg[4:10, 4:12, 3:6] = 1  # liver
        seg[12:15, 14:20, 6:9] = 2  # nodule (instances)
        seg[16:18, 2:5, 1:3] = 2
        affine = np.diag([1.0, 1.0, 5.0, 1.0])  # z (axis 2) thick -> becomes D
        write_nifti(root / "imagesTr" / f"case{i}_0000.nii.gz", vol, affine)
        write_nifti(root / "labelsTr" / f"case{i}.nii.gz", seg, affine)
    (root / "dataset.json").write_text(json.dumps({
        "labels": {"0": "background", "1": "liver", "2": "nodule"}
    }))


def test_nnunet_processor_end_to_end(tmp_path):
    src = tmp_path / "Task_Demo"
    _make_nnunet_dataset(src)
    out_root = tmp_path / "processed"
    proc = NNUNetProcessor(
        src, out_root,
        semantic={"liver": True, "nodule": False},
        conf=ProcessorConfig(max_smaller_edge=64, min_instance_voxels=4),
    )
    info = proc.process()
    assert all(r["status"] == "ok" for r in info), info
    case_dir = out_root / "Task_Demo" / "data" / "case0"
    assert (case_dir / "images.pt.zst").exists()
    assert (case_dir / "sparse.json").exists()

    from mmmm_tpu.data.sparse import Sparse
    from mmmm_tpu.utils import load_pt_zst

    sparse = Sparse.from_json((case_dir / "sparse.json").read_bytes())
    assert sparse.shape.tolist() == [10, 20, 24]  # z-first after reorient
    names = {t.name for ts in sparse.targets.values() for t in ts}
    assert names == {"liver", "nodule"}
    nod = [t for ts in sparse.targets.values() for t in ts if t.name == "nodule"][0]
    assert nod.index_offset[1] - nod.index_offset[0] == 2  # two instances
    assert nod.boxes.shape == (2, 6)
    masks = load_pt_zst(case_dir / "masks.pt.zst")
    assert masks.shape[0] == 3  # 1 liver + 2 nodule instances
    images = load_pt_zst(case_dir / "images.pt.zst")
    assert images.dtype == np.uint8 and images.shape == (1, 10, 20, 24)

    # re-run skips existing
    info2 = proc.process()
    assert all(r["status"] == "exists" for r in info2)

    # processed output feeds the online LocalTransform directly
    from mmmm_tpu.data import MMMMTokenizer
    from mmmm_tpu.data.local import DatasetConf, LocalTransConf, LocalTransform, get_local_data_list

    conf = DatasetConf(
        base_vit_patch_size_z=4, vit_patch_size_xy=4, pool_size_xy=1, base_pool_size_z=1,
        max_seq_len=640, max_targets=4,
        local_trans=LocalTransConf(max_vision_tokens=64, max_tokens_z=4, num_pos=2, num_neg=1),
    )
    tf = LocalTransform(conf, MMMMTokenizer.byte_fallback(), seed=0)
    items = get_local_data_list(out_root / "Task_Demo")
    dp = tf(items[0])
    assert dp["image"].shape[0] == 3


def test_processor_writes_deterministic_split(tmp_path):
    """split.json emitted per dataset (ref _base.py:298-303), hash-stable so
    re-processing never reshuffles cases across splits."""
    import json as _json

    from mmmm_tpu.preprocess.registry import build_processor
    from mmmm_tpu.preprocess.processor import ProcessorConfig

    src = tmp_path / "raw"
    (src / "imagesTr").mkdir(parents=True)
    (src / "labelsTr").mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        vol = rng.normal(100, 20, size=(16, 16, 8)).astype(np.float32)
        seg = np.zeros((16, 16, 8), np.int16)
        seg[2:8, 2:8, 2:5] = 1
        affine = np.diag([1.0, 1.0, 4.0, 1.0])
        write_nifti(src / "imagesTr" / f"c{i}_0000.nii.gz", vol, affine)
        write_nifti(src / "labelsTr" / f"c{i}.nii.gz", seg, affine)
    (src / "dataset.json").write_text(_json.dumps({"labels": {"0": "background", "1": "spleen"}}))

    proc = build_processor("MSD-Task09-Spleen", src, tmp_path / "out",
                           ProcessorConfig(max_smaller_edge=64))
    proc.process()
    split_path = tmp_path / "out/MSD-Task09-Spleen/split.json"
    split = _json.loads(split_path.read_text())
    assert set(split) == {"train", "validate", "test"}
    all_keys = sorted(split["train"] + split["validate"] + split["test"])
    assert all_keys == [f"c{i}" for i in range(6)]
    # determinism: reprocessing (cases now 'exists') produces the same split
    first = split
    proc2 = build_processor("MSD-Task09-Spleen", src, tmp_path / "out",
                            ProcessorConfig(max_smaller_edge=64))
    proc2.process()
    assert _json.loads(split_path.read_text()) == first
