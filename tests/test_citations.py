"""Citation parsing + grounding math vs reference semantics
(/root/reference/src/utils/quality_controls.py:34,544-578,718-748)."""

from hinbox_ray.functions.citations import (
    MISSING_SOURCE,
    NOT_SUPPORTED,
    PARTIAL,
    SUPPORTED,
    UNCLEAR,
    extract_cited_claims,
    ground_profile,
    grounding_summary,
)


def test_extract_basic_claims():
    text = "He was detained in 2002.^[a1] He was released later.^[a2]"
    claims = extract_cited_claims(text)
    assert [c["article_id"] for c in claims] == ["a1", "a2"]
    assert claims[0]["claim"] == "He was detained in 2002."
    assert claims[1]["claim"] == "He was released later."
    assert claims[0]["citation"] == "^[a1]"


def test_adjacent_citations_reuse_last_claim():
    text = "One fact here.^[a1]^[a2]"
    claims = extract_cited_claims(text)
    assert len(claims) == 2
    assert claims[0]["claim"] == claims[1]["claim"] == "One fact here."


def test_leading_citation_has_placeholder_claim():
    claims = extract_cited_claims("^[a1] trailing text")
    assert claims[0]["claim"] == "(no claim text)"


def test_citation_regex_rejects_whitespace_ids():
    assert extract_cited_claims("x.^[bad id]") == []


def test_grounding_summary_math_and_flags():
    rep = grounding_summary(
        [SUPPORTED, PARTIAL, NOT_SUPPORTED, UNCLEAR, MISSING_SOURCE]
    )
    assert rep["total_citations"] == 5
    assert rep["verified"] == 2
    assert rep["unverified"] == 2
    assert rep["missing_source"] == 1
    assert rep["grounding_score"] == 2 / 5
    assert "missing_sources" in rep["flags"]
    assert "unsupported_claims" in rep["flags"]
    assert "low_grounding_score" in rep["flags"] and not rep["passed"]


def test_grounding_summary_empty():
    rep = grounding_summary([])
    assert rep["grounding_score"] is None and rep["passed"]


def test_ground_profile_end_to_end():
    articles = {"a1": "The detainee was transferred on Friday to Camp Echo."}
    text = "was transferred on Friday^[a1] and protested loudly^[a1] plus more^[missing]"
    rep = ground_profile(text, articles)
    assert rep["total_citations"] == 3
    assert rep["verified"] == 1          # substring hit
    assert rep["missing_source"] == 1    # unknown article id
    assert rep["unverified"] == 1
