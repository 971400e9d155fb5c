"""Phrase tagging for grounded-report construction (offline VG pipeline).

Equivalent of the reference's two-pass Llama-3-70B tagger
(``scripts/data/vg/tag.py``): mark anatomical/anomaly phrase spans in a
cleaned report and emit char-offset tags consumed by ``GRGTransform``. The
LLM tagger is an interface (``Tagger``); the default implementation is a
taxonomy-driven matcher (longest-synonym-first, word-boundary, negation-
filtered to positives only — pass 2 of the reference). Environments with a
local LLM can register their own ``Tagger``.

Offsets satisfy the reference's round-trip invariant:
``report[tag["start"]:tag["end"]] == phrase``.
"""
from __future__ import annotations

import re

from ..data.target_tax import TargetClass

_NEG_PAT = re.compile(
    r"\b(no|without|negative for|free of|clear of|absence of|resolved|rather than|ruled? out)\b",
    re.IGNORECASE,
)


class Tagger:
    def tag(self, report: str) -> list[dict]:
        """Returns [{"start", "end", "phrase", "target"}] sorted by start."""
        raise NotImplementedError


class TaxonomyTagger(Tagger):
    def __init__(self, target_tax: dict[str, TargetClass], positives_only: bool = True):
        self.positives_only = positives_only
        # longest synonym first so "left lung" beats "lung"
        entries = []
        for cls in target_tax.values():
            for syn in cls.synonyms:
                entries.append((syn.lower(), cls.name))
        entries.sort(key=lambda e: -len(e[0]))
        self.entries = entries

    def tag(self, report: str) -> list[dict]:
        low = report.lower()
        taken: list[tuple[int, int]] = []
        tags = []
        for syn, target in self.entries:
            for m in re.finditer(rf"\b{re.escape(syn)}\b", low):
                s, e = m.span()
                if any(not (e <= ts or s >= te) for ts, te in taken):
                    continue  # overlaps an earlier (longer) match
                if self.positives_only and self._negated(low, s):
                    continue
                taken.append((s, e))
                tags.append({"start": s, "end": e, "phrase": report[s:e], "target": target})
        tags.sort(key=lambda t: t["start"])
        return tags

    @staticmethod
    def _negated(text: str, start: int) -> bool:
        sent_start = max(text.rfind(".", 0, start), text.rfind(";", 0, start), 0)
        return bool(_NEG_PAT.search(text[sent_start:start]))


def verify_tags(report: str, tags: list[dict]) -> None:
    """The reference's offset round-trip assertion (``tag.py``)."""
    for t in tags:
        got = report[t["start"] : t["end"]]
        if got != t["phrase"]:
            raise AssertionError(f"tag offset mismatch: {got!r} != {t['phrase']!r}")
