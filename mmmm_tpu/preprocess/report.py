"""Radiology report sectioning + cleaning (MIMIC-CXR style).

Equivalent of the reference's vendored MIT report sectioner + impression
cleaning (``scripts/data/vl/MIMIC-CXR.py``): split a raw report into
FINDINGS / IMPRESSION (and other) sections by heading, normalize whitespace,
and drop boilerplate (exam technique, comparison-to-prior phrasing) that the
reference removes with an LLM pass — here with conservative rules so the
pipeline runs fully offline; the LLM cleaner hook can replace it when a local
model is configured.
"""
from __future__ import annotations

import re

_SECTION_HEADS = [
    "findings", "impression", "indication", "comparison", "technique",
    "examination", "history", "clinical information", "clinical indication",
    "recommendation", "conclusion", "wet read", "reason for exam",
    "reason for examination", "final report",
]
_HEAD_RE = re.compile(
    r"^\s*(" + "|".join(h.replace(" ", r"\s+") for h in _SECTION_HEADS) + r")\s*:",
    re.IGNORECASE | re.MULTILINE,
)
_PRIOR_RE = re.compile(
    r"[^.]*\b(compared? (to|with)|in comparison|prior (study|exam|radiograph)|"
    r"previous (study|exam|radiograph)|interval change)\b[^.]*\.",
    re.IGNORECASE,
)


def split_sections(report: str) -> dict[str, str]:
    """Heading -> body; text before the first heading lands in ``preamble``."""
    sections: dict[str, str] = {}
    matches = list(_HEAD_RE.finditer(report))
    if not matches:
        return {"preamble": normalize_whitespace(report)}
    if matches[0].start() > 0:
        pre = report[: matches[0].start()].strip()
        if pre:
            sections["preamble"] = normalize_whitespace(pre)
    for m, nxt in zip(matches, matches[1:] + [None]):
        head = re.sub(r"\s+", " ", m.group(1).lower())
        end = nxt.start() if nxt else len(report)
        body = report[m.end() : end].strip()
        if body:
            sections[head] = normalize_whitespace(body)
    return sections


def normalize_whitespace(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def remove_prior_references(text: str) -> str:
    """Drop sentences that only compare to prior studies (LLM-cleaner fallback,
    ``scripts/data/vl/llama3_process.py`` analog)."""
    return normalize_whitespace(_PRIOR_RE.sub("", text))


def extract_findings_impression(report: str, clean: bool = True) -> dict[str, str | None]:
    sections = split_sections(report)
    findings = sections.get("findings")
    impression = sections.get("impression") or sections.get("conclusion")
    if findings is None and impression is None:
        # some reports are a single unlabeled narrative
        findings = sections.get("preamble")
    if clean:
        if findings:
            findings = remove_prior_references(findings)
        if impression:
            impression = remove_prior_references(impression)
    return {"findings": findings or None, "impression": impression or None}


def build_processed_report(findings: str | None, impression: str | None) -> str | None:
    parts = []
    if findings:
        parts.append(f"Findings: {findings}")
    if impression:
        parts.append(f"Impression: {impression}")
    return " ".join(parts) if parts else None
