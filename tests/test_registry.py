"""Dataset recipe registry tests."""
import json

import numpy as np
import pytest

from mmmm_tpu.data.target_tax import ANOMALY, get_target_tax
from mmmm_tpu.preprocess.registry import REGISTRY, build_processor
from mmmm_tpu.preprocess.nifti import write_nifti
from mmmm_tpu.preprocess.processor import ProcessorConfig


def test_registry_names_in_taxonomy():
    """Every recipe class name resolves in the built-in taxonomy (so category
    routing and synonym sampling work)."""
    tax = get_target_tax()
    missing = []
    for recipe in REGISTRY.values():
        for name in (recipe.class_map or {}).values():
            if name not in tax:
                missing.append((recipe.name, name))
    assert not missing, missing


def test_registry_semantic_flags():
    r = REGISTRY["KiTS23"]
    assert r.semantic["kidney"] is True
    assert r.semantic["kidney tumor"] is False  # instances split


def test_build_processor_with_recipe(tmp_path):
    # nnunet layout with dataset.json labels that the recipe OVERRIDES
    src = tmp_path / "raw"
    (src / "imagesTr").mkdir(parents=True)
    (src / "labelsTr").mkdir()
    rng = np.random.default_rng(0)
    vol = rng.normal(100, 20, size=(16, 16, 8)).astype(np.float32)
    seg = np.zeros((16, 16, 8), np.int16)
    seg[2:8, 2:8, 2:5] = 1  # spleen per MSD-Task09 recipe
    affine = np.diag([1.0, 1.0, 4.0, 1.0])
    write_nifti(src / "imagesTr" / "c0_0000.nii.gz", vol, affine)
    write_nifti(src / "labelsTr" / "c0.nii.gz", seg, affine)
    (src / "dataset.json").write_text(json.dumps({"labels": {"0": "background", "1": "whatever"}}))

    proc = build_processor("MSD-Task09-Spleen", src, tmp_path / "out", ProcessorConfig(max_smaller_edge=64))
    info = proc.process()
    assert info[0]["status"] == "ok", info
    from mmmm_tpu.data.sparse import Sparse

    sp = Sparse.from_json((tmp_path / "out/MSD-Task09-Spleen/data/c0/sparse.json").read_bytes())
    names = {t.name for ts in sp.targets.values() for t in ts}
    assert names == {"spleen"}
    assert sp.targets["anatomy"][0].name == "spleen"


def test_registry_coverage():
    # the reference enables 34 datasets in conf/phase-vg/data.yaml and ships
    # 35 processor subclasses; the registry must cover at least that
    assert len(REGISTRY) >= 34
    tax = get_target_tax()
    anomalies = [n for n, t in tax.items() if t.category == ANOMALY]
    assert len(anomalies) >= 40
    assert len(tax) >= 180
