"""Pair verifier + dispute routing (reference A4/A5/S9 analog)."""

import json

import ray.data as rd

from hinbox_ray.stages.verify import (
    DEFER,
    MATCH,
    SKIP,
    PairVerifier,
    candidate_pairs_with_meta,
    verify_pairs,
    write_review_queue,
)


def test_verifier_rules():
    v = PairVerifier()
    # exact-equivalence pair → MATCH
    assert (
        v._decide("organizations", "Department of Defense", "DoD", "", "")
        == MATCH
    )
    # low-quality name never auto-merges
    assert (
        v._decide("organizations", "defense departments", "DoD", "", "") == SKIP
    )
    # unrelated names → SKIP
    assert v._decide("people", "Alice Smith", "Bob Jones", "", "") == SKIP


def test_verifier_memo_hits():
    v = PairVerifier()
    v._decide("people", "Alice Smith", "Alicia Smith", "", "")
    v._decide("people", "Alice Smith", "Alicia Smith", "", "")
    assert v._decide.cache_info().hits >= 1


def test_pipeline_and_review_queue(ray_session, tmp_path):
    from hinbox_ray.sources.pages import generate_pages_table
    from hinbox_ray.stages.extract import extract_and_filter
    from hinbox_ray.stages.mentions import extract_mentions
    from hinbox_ray.stages.resolve import raw_entities

    pages = rd.from_arrow(generate_pages_table(120))
    mentions = extract_mentions(
        extract_and_filter(pages), concurrency=2
    ).materialize()
    raw = raw_entities(mentions).materialize()
    pairs = candidate_pairs_with_meta(raw)
    verdicts = verify_pairs(pairs, concurrency=2).materialize()
    vd = verdicts.to_pandas()
    assert set(vd["verdict"]).issubset({MATCH, SKIP, DEFER})
    # every accepted resolution edge shows up as MATCH here
    assert (vd["verdict"] == MATCH).sum() > 0
    q = tmp_path / "review.jsonl"
    n = write_review_queue(verdicts, str(q))
    if n:
        lines = [json.loads(x) for x in q.read_text().splitlines()]
        assert all(l["verdict"] == DEFER for l in lines)
        assert len(lines) == n
