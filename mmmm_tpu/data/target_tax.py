"""Target taxonomy: class names, categories, synonyms, hierarchy.

Equivalent of ``mmmm/data/target_tax.py`` (which reads
``data/target-tax.xlsx`` with anatomy/anomaly sheets). This implementation
reads a JSON taxonomy (one object per class) and also accepts the reference's
xlsx when pandas+openpyxl can read it. A built-in mini taxonomy backs tests.
"""
from __future__ import annotations

import dataclasses
import functools
import json
from pathlib import Path

ANATOMY = "anatomy"
ANOMALY = "anomaly"


@dataclasses.dataclass
class TargetClass:
    name: str
    category: str  # anatomy | anomaly
    synonyms: list[str] = dataclasses.field(default_factory=list)
    parents: list[str] = dataclasses.field(default_factory=list)
    children: list[str] = dataclasses.field(default_factory=list)

    def __post_init__(self):
        if self.name not in self.synonyms:
            self.synonyms = [self.name, *self.synonyms]


_BUILTIN = [
    # anatomy
    TargetClass("liver", ANATOMY, ["hepar"]),
    TargetClass("heart", ANATOMY, ["cardiac silhouette"]),
    TargetClass("left lung", ANATOMY),
    TargetClass("right lung", ANATOMY),
    TargetClass("kidney", ANATOMY, ["renal organ"]),
    TargetClass("left kidney", ANATOMY),
    TargetClass("right kidney", ANATOMY),
    TargetClass("spleen", ANATOMY),
    TargetClass("gallbladder", ANATOMY),
    TargetClass("esophagus", ANATOMY),
    TargetClass("stomach", ANATOMY),
    TargetClass("aorta", ANATOMY),
    TargetClass("inferior vena cava", ANATOMY, ["IVC"]),
    TargetClass("pancreas", ANATOMY),
    TargetClass("left adrenal gland", ANATOMY),
    TargetClass("right adrenal gland", ANATOMY),
    TargetClass("duodenum", ANATOMY),
    TargetClass("urinary bladder", ANATOMY, ["bladder"]),
    TargetClass("prostate", ANATOMY),
    TargetClass("colon", ANATOMY),
    TargetClass("intestine", ANATOMY, ["small bowel"]),
    TargetClass("rectum", ANATOMY),
    TargetClass("left atrium", ANATOMY),
    TargetClass("hepatic vessel", ANATOMY),
    TargetClass("anterior hippocampus", ANATOMY),
    TargetClass("posterior hippocampus", ANATOMY),
    TargetClass("peripheral zone of prostate", ANATOMY),
    TargetClass("transition zone of prostate", ANATOMY),
    TargetClass("left head of femur", ANATOMY),
    TargetClass("right head of femur", ANATOMY),
    *[
        TargetClass(f"vertebra {v}", ANATOMY)
        for v in ["C1", "C2", "C3", "C4", "C5", "C6", "C7",
                  "T1", "T2", "T3", "T4", "T5", "T6", "T7", "T8", "T9", "T10", "T11", "T12",
                  "L1", "L2", "L3", "L4", "L5"]
    ],
    # anomaly
    TargetClass("glioma", ANOMALY, ["brain tumor"]),
    TargetClass("nodule", ANOMALY, ["pulmonary nodule", "lung nodule"]),
    TargetClass("pleural effusion", ANOMALY, ["effusion"]),
    TargetClass("cardiomegaly", ANOMALY, ["enlarged heart"]),
    TargetClass("kidney tumor", ANOMALY, ["renal tumor"]),
    TargetClass("kidney cyst", ANOMALY, ["renal cyst"]),
    TargetClass("liver tumor", ANOMALY, ["hepatic tumor"]),
    TargetClass("lung tumor", ANOMALY),
    TargetClass("pancreatic tumor", ANOMALY),
    TargetClass("colon cancer", ANOMALY, ["colorectal cancer"]),
    TargetClass("necrotic tumor core", ANOMALY),
    TargetClass("peritumoral edema", ANOMALY),
    TargetClass("enhancing tumor", ANOMALY),
    TargetClass("non-enhancing tumor core", ANOMALY),
    TargetClass("atelectasis", ANOMALY),
    TargetClass("pneumothorax", ANOMALY),
    TargetClass("pulmonary consolidation", ANOMALY, ["consolidation"]),
    TargetClass("pulmonary edema", ANOMALY, ["edema"]),
    TargetClass("pulmonary fibrosis", ANOMALY, ["fibrosis"]),
    TargetClass("aortic enlargement", ANOMALY),
    TargetClass("calcification", ANOMALY),
    TargetClass("interstitial lung disease", ANOMALY, ["ILD"]),
    TargetClass("pulmonary opacification", ANOMALY, ["lung opacity"]),
    TargetClass("pleural thickening", ANOMALY),
    TargetClass("rib fracture", ANOMALY),
    TargetClass("clavicle fracture", ANOMALY),
    TargetClass("mediastinal shift", ANOMALY),
]


def load_target_tax(path: str | Path | None = None) -> dict[str, TargetClass]:
    if path is None:
        return {t.name: t for t in _BUILTIN}
    path = Path(path)
    if path.suffix == ".json":
        items = json.loads(path.read_text())
        tax = {
            d["name"]: TargetClass(
                d["name"],
                d["category"],
                d.get("synonyms", []),
                d.get("parents", []),
                d.get("children", []),
            )
            for d in items
        }
        return tax
    if path.suffix == ".xlsx":
        import pandas as pd

        tax = {}
        for category in (ANATOMY, ANOMALY):
            df = pd.read_excel(path, sheet_name=category)
            for _, row in df.iterrows():
                syn = row.get("synonyms")
                synonyms = [s.strip() for s in str(syn).split("|")] if isinstance(syn, str) else []
                tax[row["name"]] = TargetClass(row["name"], category, synonyms)
        return tax
    raise ValueError(f"unsupported taxonomy file {path}")


@functools.lru_cache(maxsize=4)
def get_target_tax(path: str | None = None) -> dict[str, TargetClass]:
    return load_target_tax(path)
