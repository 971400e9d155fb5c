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
    TargetClass("liver", ANATOMY, ["hepar"]),
    TargetClass("heart", ANATOMY, ["cardiac silhouette"]),
    TargetClass("left lung", ANATOMY),
    TargetClass("right lung", ANATOMY),
    TargetClass("kidney", ANATOMY, ["renal organ"]),
    TargetClass("spleen", ANATOMY),
    TargetClass("glioma", ANOMALY, ["brain tumor"]),
    TargetClass("nodule", ANOMALY, ["pulmonary nodule"]),
    TargetClass("pleural effusion", ANOMALY, ["effusion"]),
    TargetClass("cardiomegaly", ANOMALY, ["enlarged heart"]),
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
