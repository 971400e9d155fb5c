"""Multi-annotator box fusion + box-folder processor tests."""
import numpy as np
from PIL import Image

from mmmm_tpu.preprocess.boxes import (
    BoxCase,
    BoxFolderProcessor,
    box_iou_2d,
    fuse_annotator_boxes,
)


def test_box_iou_2d():
    a = np.asarray([[0, 0, 10, 10]], float)
    b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = box_iou_2d(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_fusion_merges_cross_annotator_agreement():
    # three annotators agree on one finding (overlapping boxes), one outlier
    boxes = np.asarray([
        [10, 10, 30, 30],
        [12, 11, 31, 29],
        [11, 12, 29, 31],
        [70, 70, 90, 90],
    ], float)
    rads = np.asarray(["r1", "r2", "r3", "r1"])
    fused = fuse_annotator_boxes(boxes, rads)
    assert fused.shape == (2, 4)
    centers = fused[:, :2]
    assert any(np.allclose(c, [11, 11], atol=1.5) for c in centers)
    assert any(np.allclose(c, [70, 70], atol=0.1) for c in centers)


def test_fusion_same_annotator_never_merges():
    # same annotator drawing two overlapping boxes = two findings
    boxes = np.asarray([[10, 10, 30, 30], [12, 12, 32, 32]], float)
    rads = np.asarray(["r1", "r1"])
    fused = fuse_annotator_boxes(boxes, rads)
    assert fused.shape == (2, 4)


def test_fusion_dedup_exact_same_annotator():
    boxes = np.asarray([[10, 10, 30, 30], [10, 10, 30, 30]], float)
    rads = np.asarray(["r1", "r1"])
    assert fuse_annotator_boxes(boxes, rads).shape == (1, 4)


def test_box_folder_processor(tmp_path):
    img = tmp_path / "img0.png"
    Image.fromarray(np.random.default_rng(0).integers(0, 255, size=(100, 80), dtype=np.uint8).copy(), "L").save(img)
    case = BoxCase(
        key="case0",
        image=img,
        annotations={
            "nodule": [
                ("r1", (10, 20, 30, 40)),
                ("r2", (12, 21, 29, 41)),
            ]
        },
        neg_classes=["cardiomegaly"],
    )
    proc = BoxFolderProcessor("VinDr-demo", [case], tmp_path / "out")
    info = proc.process()
    assert info[0]["status"] == "ok"

    from mmmm_tpu.data.sparse import Sparse

    sparse = Sparse.from_json(
        (tmp_path / "out/VinDr-demo/data/case0/sparse.json").read_bytes()
    )
    t = sparse.targets["anomaly"][0]
    assert t.name == "nodule" and len(t.boxes) == 1
    # boxes are (d0, h0, w0, d1, h1, w1): h from y, w from x
    b = t.boxes[0]
    assert b[0] == 0 and b[3] == 1
    assert 19 <= b[1] <= 22 and 9 <= b[2] <= 12


def test_load_box_cases_and_registry_dispatch(tmp_path):
    """`--dataset VinDr-CXR` end-to-end from a synthetic VinDr-style folder."""
    rng = np.random.default_rng(1)
    src = tmp_path / "vindr"
    (src / "train").mkdir(parents=True)
    for key in ("s0", "s1", "s2"):
        Image.fromarray(
            rng.integers(0, 255, size=(64, 48), dtype=np.uint8).copy(), "L"
        ).save(src / "train" / f"{key}.png")
    (src / "annotations_train.csv").write_text(
        "image_id,class_name,rad_id,x_min,y_min,x_max,y_max\n"
        "s0,Nodule/Mass,R1,10,12,20,22\n"
        "s0,Nodule/Mass,R2,11,12,21,23\n"
        "s0,Cardiomegaly,R1,5,30,40,60\n"
        "s1,No finding,R1,,,,\n"
        "s2,No finding,R3,,,,\n"
        "s2,Aortic enlargement,R1,8,8,16,16\n"
    )

    from mmmm_tpu.preprocess.boxes import load_box_cases
    from mmmm_tpu.preprocess.registry import build_processor

    cases = {c.key: c for c in load_box_cases(src)}
    assert set(cases) == {"s0", "s1", "s2"}
    assert set(cases["s0"].annotations) == {"Nodule/Mass", "Cardiomegaly"}
    assert cases["s0"].neg_classes == []
    # pure-negative study: negative for every class seen in the csv
    assert set(cases["s1"].neg_classes) == {"Nodule/Mass", "Cardiomegaly", "Aortic enlargement"}
    # "No finding" from one rad + positives from another: negs exclude positives
    assert set(cases["s2"].neg_classes) == {"Nodule/Mass", "Cardiomegaly"}

    proc = build_processor("VinDr-CXR", src, tmp_path / "out")
    info = proc.process()
    assert sorted(r["status"] for r in info) == ["ok", "ok", "ok"]

    from mmmm_tpu.data.sparse import Sparse

    sparse = Sparse.from_json((tmp_path / "out/VinDr-CXR/data/s0/sparse.json").read_bytes())
    names = {t.name for t in sparse.targets["anomaly"]}
    assert names == {"Nodule/Mass", "Cardiomegaly"}
