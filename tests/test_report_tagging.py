"""Report sectioning + phrase tagging tests."""
from mmmm_tpu.data.target_tax import get_target_tax
from mmmm_tpu.preprocess.report import (
    build_processed_report,
    extract_findings_impression,
    remove_prior_references,
    split_sections,
)
from mmmm_tpu.preprocess.tagging import TaxonomyTagger, verify_tags


RAW = """FINAL REPORT
EXAMINATION: Chest radiograph

INDICATION: Cough and fever.

COMPARISON: None.

FINDINGS: The lungs are clear. The heart size is normal.
Compared to the prior study, no interval change.

IMPRESSION: No acute cardiopulmonary process.
"""


def test_split_sections():
    s = split_sections(RAW)
    assert "findings" in s and "impression" in s and "indication" in s
    assert s["impression"] == "No acute cardiopulmonary process."
    assert "lungs are clear" in s["findings"]


def test_prior_removal_and_processed_report():
    out = extract_findings_impression(RAW)
    assert "prior study" not in out["findings"]
    assert "lungs are clear" in out["findings"]
    rep = build_processed_report(**out)
    assert rep.startswith("Findings: ") and "Impression: " in rep


def test_unsectioned_report_fallback():
    out = extract_findings_impression("Heart and lungs normal. No effusion.")
    assert out["findings"] is not None
    assert out["impression"] is None


def test_taxonomy_tagger():
    tax = get_target_tax()
    report = "A nodule is seen in the left lung. No pleural effusion. The heart is enlarged."
    tags = TaxonomyTagger(tax).tag(report)
    verify_tags(report, tags)
    targets = [t["target"] for t in tags]
    assert "lung nodule" in targets
    assert "left lung" in targets
    # negated finding excluded in positives-only mode
    assert "pleural effusion" not in targets
    assert "heart" in targets
    # longest-match wins: "left lung" not additionally tagged as bare synonyms
    phrases = [t["phrase"] for t in tags]
    assert "left lung" in phrases


def test_tagger_tags_feed_grg_format():
    tax = get_target_tax()
    report = "There is cardiomegaly and a small nodule."
    tags = TaxonomyTagger(tax).tag(report)
    assert all(set(t) >= {"start", "end", "target"} for t in tags)
    assert tags == sorted(tags, key=lambda t: t["start"])


def test_parse_linked_report_roundtrip():
    from mmmm_tpu.preprocess.tagging import parse_linked_report

    original = "Mild cardiomegaly is present. The lungs are clear."
    linked = "Mild [cardiomegaly](cardiomegaly) is present. The [lungs](lung) are clear."
    tags = parse_linked_report(original, linked)
    assert tags is not None
    verify_tags(original, tags)
    assert [t["target"] for t in tags] == ["cardiomegaly", "lung"]
    # LLM that edited the prose invalidates the parse
    assert parse_linked_report(original, linked.replace("Mild", "Severe")) is None


def test_llm_tagger_two_pass_and_fallback():
    from mmmm_tpu.data.target_tax import get_target_tax
    from mmmm_tpu.preprocess.tagging import LLMTagger, TaxonomyTagger

    reports = [
        "Mild cardiomegaly is present.",
        "No pleural effusion is seen.",
    ]
    calls = []

    def fake_llm(prompts):
        calls.append(len(prompts))
        out = []
        for p in prompts:
            src = p.rsplit("Report: ", 1)[1].rsplit("\nAnnotated:", 1)[0]
            if "reviewer" in p:
                out.append(src)  # filter pass: keep as-is
            elif "cardiomegaly" in src:
                out.append(src.replace("cardiomegaly", "[cardiomegaly](cardiomegaly)"))
            else:
                out.append("GARBLED " + src)  # breaks round-trip -> fallback
        return out

    tagger = LLMTagger(
        fake_llm, ["cardiomegaly", "pleural effusion"],
        fallback=TaxonomyTagger(get_target_tax()),
    )
    tags = tagger.tag_batch(reports)
    assert len(calls) == 2  # tag pass + filter pass
    assert tags[0][0]["target"] == "cardiomegaly"
    verify_tags(reports[0], tags[0])
    # second report fell back to the taxonomy matcher: negated -> no tags
    assert tags[1] == []
