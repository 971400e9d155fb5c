"""Per-dataset processing recipes (the reference's 35 processor subclasses).

Each entry supplies what a layout adapter cannot infer: the label-value ->
taxonomy-name map, per-class semantic flags (instances merged?), modality, and
the layout adapter to use. Class vocabularies follow the public dataset
definitions (AMOS, MSD, KiTS, LiTS, VerSe, TotalSegmentator, BraTS, ...).

Usage: ``scripts/data/process.py --dataset AMOS22 --src ... --out ...``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable


@dataclasses.dataclass(frozen=True)
class DatasetRecipe:
    name: str
    layout: str  # nnunet | segfolder | boxfolder
    modality: str = "CT"
    class_map: dict[int, str] | None = None  # overrides dataset.json when set
    semantic: dict[str, bool] | None = None  # default: semantic (merged)
    instance_classes: tuple[str, ...] = ()  # classes to split into instances


def _sem(recipe_classes: dict[int, str], instance: tuple[str, ...]) -> dict[str, bool]:
    return {name: name not in instance for name in recipe_classes.values()}


_AMOS_CLASSES = {
    1: "spleen", 2: "right kidney", 3: "left kidney", 4: "gallbladder",
    5: "esophagus", 6: "liver", 7: "stomach", 8: "aorta", 9: "inferior vena cava",
    10: "pancreas", 11: "right adrenal gland", 12: "left adrenal gland",
    13: "duodenum", 14: "urinary bladder", 15: "prostate",
}

REGISTRY: dict[str, DatasetRecipe] = {}


def _register(r: DatasetRecipe):
    REGISTRY[r.name] = r
    return r


_register(DatasetRecipe("AMOS22", "nnunet", "CT", _AMOS_CLASSES, _sem(_AMOS_CLASSES, ())))
_register(DatasetRecipe(
    "KiTS23", "nnunet", "CT",
    {1: "kidney", 2: "kidney tumor", 3: "kidney cyst"},
    {"kidney": True, "kidney tumor": False, "kidney cyst": False},
))
_register(DatasetRecipe(
    "LiTS17", "nnunet", "CT",
    {1: "liver", 2: "liver tumor"},
    {"liver": True, "liver tumor": False},
))
# Medical Segmentation Decathlon
_register(DatasetRecipe("MSD-Task02-Heart", "nnunet", "MRI", {1: "left atrium"}))
_register(DatasetRecipe(
    "MSD-Task03-Liver", "nnunet", "CT",
    {1: "liver", 2: "liver tumor"}, {"liver": True, "liver tumor": False},
))
_register(DatasetRecipe("MSD-Task04-Hippocampus", "nnunet", "MRI",
                        {1: "anterior hippocampus", 2: "posterior hippocampus"}))
_register(DatasetRecipe("MSD-Task05-Prostate", "nnunet", "MRI",
                        {1: "peripheral zone of prostate", 2: "transition zone of prostate"}))
_register(DatasetRecipe(
    "MSD-Task06-Lung", "nnunet", "CT", {1: "lung tumor"}, {"lung tumor": False},
))
_register(DatasetRecipe(
    "MSD-Task07-Pancreas", "nnunet", "CT",
    {1: "pancreas", 2: "pancreatic tumor"}, {"pancreas": True, "pancreatic tumor": False},
))
_register(DatasetRecipe(
    "MSD-Task08-HepaticVessel", "nnunet", "CT",
    {1: "hepatic vessel", 2: "liver tumor"}, {"hepatic vessel": True, "liver tumor": False},
))
_register(DatasetRecipe("MSD-Task09-Spleen", "nnunet", "CT", {1: "spleen"}))
_register(DatasetRecipe(
    "MSD-Task10-Colon", "nnunet", "CT", {1: "colon cancer"}, {"colon cancer": False},
))
# BraTS-style glioma regions (multi-modal MRI; region masks are semantic)
_register(DatasetRecipe(
    "BraTS2023-GLI", "nnunet", "MRI",
    {1: "necrotic tumor core", 2: "peritumoral edema", 3: "enhancing tumor"},
))
_register(DatasetRecipe("TotalSegmentator", "segfolder", "CT"))
_register(DatasetRecipe("VinDr-CXR", "boxfolder", "X-ray"))
_register(DatasetRecipe(
    "VerSe", "nnunet", "CT",
    {i: f"vertebra {name}" for i, name in enumerate(
        ["C1", "C2", "C3", "C4", "C5", "C6", "C7",
         "T1", "T2", "T3", "T4", "T5", "T6", "T7", "T8", "T9", "T10", "T11", "T12",
         "L1", "L2", "L3", "L4", "L5"], start=1)},
))
_register(DatasetRecipe(
    "WORD", "nnunet", "CT",
    {1: "liver", 2: "spleen", 3: "left kidney", 4: "right kidney", 5: "stomach",
     6: "gallbladder", 7: "esophagus", 8: "pancreas", 9: "duodenum", 10: "colon",
     11: "intestine", 12: "right adrenal gland", 13: "rectum", 14: "urinary bladder",
     15: "left head of femur", 16: "right head of femur"},
))
_register(DatasetRecipe("MSD-Task01-BrainTumour", "nnunet", "MRI",
                        {1: "peritumoral edema", 2: "non-enhancing tumor core", 3: "enhancing tumor"}))


def build_processor(name: str, src, out, conf=None):
    from .boxes import BoxFolderProcessor
    from .processor import NNUNetProcessor
    from .seg_folder import SegFolderProcessor

    recipe = REGISTRY[name]
    if recipe.layout == "nnunet":
        proc = NNUNetProcessor(src, out, name=name, modality=recipe.modality,
                               semantic=recipe.semantic, conf=conf)
        if recipe.class_map is not None:
            base_get = proc.get_cases

            def get_cases():
                cases = base_get()
                for c in cases:
                    c.class_map = recipe.class_map
                return cases

            proc.get_cases = get_cases
        return proc
    if recipe.layout == "segfolder":
        return SegFolderProcessor(src, out, name=name, modality=recipe.modality, conf=conf)
    if recipe.layout == "boxfolder":
        from .boxes import load_box_cases

        return BoxFolderProcessor(name, load_box_cases(src), out, conf=conf)
    raise ValueError(f"{name}: layout {recipe.layout} needs a custom driver")
