"""Relevance gate (F3) + QC-triggered extraction retry (A9)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from hinbox_ray.stages.relevance import (
    RelevanceScorer,
    normalize_relevance_result,
    relevance_gate,
)


def test_normalize_relevance_result_shapes():
    """Tolerant result-shape handling (reference
    article_processor.py:96-108)."""
    assert normalize_relevance_result(True) == (True, "")
    assert normalize_relevance_result(False) == (False, "")

    class R:
        is_relevant = False
        reason = "off-topic"

    assert normalize_relevance_result(R()) == (False, "off-topic")
    assert normalize_relevance_result({"is_relevant": True, "reason": "x"}) == (
        True,
        "x",
    )
    # unknown shape → relevant with the reference's sentinel reason
    assert normalize_relevance_result(42) == (True, "uncertain_result_shape")
    assert normalize_relevance_result(None) == (True, "uncertain_result_shape")


def test_default_scorer_matches_extractor_lexicon():
    s = RelevanceScorer()
    assert s._score("Carol Rosenberg reported from Guantanamo Bay.")[0]
    assert not s._score("A cooking blog about sourdough starters.")[0]
    # word-boundary: a surface inside a longer word does not count
    assert not s._score("the NICEST weather")[0]


def test_relevance_gate_drops_planted_irrelevant(ray_session):
    from hinbox_ray.sources.pages import generate_pages_table
    from hinbox_ray.stages.extract import extract_and_filter

    pages = generate_pages_table(80)
    docs = extract_and_filter(rd.from_arrow(pages)).materialize()
    n_before = docs.count()

    planted = pa.table(
        {
            "url": pa.array([f"https://irrelevant.example/{i}" for i in range(7)]),
            "warc_ts": pa.array([None] * 7, type=pa.timestamp("us")),
            "text": pa.array(["Nothing about the domain here."] * 7),
        }
    )
    mixed = docs.select_columns(["url", "warc_ts", "text"]).union(
        rd.from_arrow(planted)
    )
    kept = relevance_gate(mixed, concurrency=2).materialize()
    kept_df = kept.to_pandas()
    assert not kept_df["url"].str.startswith("https://irrelevant.example/").any()
    # exactly the gazetteer-bearing docs survive (the gate cannot change
    # the graph: a dropped doc provably has zero extractable mentions)
    from hinbox_ray.stages.mentions import MentionExtractor

    ext = MentionExtractor()
    docs_df = docs.to_pandas()
    n_with_entities = sum(
        bool(ext._extract_doc(t)) for t in docs_df["text"]
    )
    assert kept.count() == n_with_entities


def test_relevance_gate_custom_scorer_llm_shape(ray_session):
    """A pluggable scorer returning dict-shaped results gates the docs."""
    docs = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["a", "b", "c"]),
                "warc_ts": pa.array([None] * 3, type=pa.timestamp("us")),
                "text": pa.array(["keep me", "drop me", "keep me too"]),
            }
        )
    )

    def scorer(text):
        return {"is_relevant": "keep" in text, "reason": "stub"}

    kept = relevance_gate(docs, scorer_fn=scorer, concurrency=2).to_pandas()
    assert sorted(kept["url"]) == ["a", "c"]
    assert list(kept.columns) == ["url", "warc_ts", "text"]


def test_qc_retry_recovers_flaky_extraction():
    """A stochastic extractor whose first attempt returns nothing is
    rescued by the QC-triggered retry; pick-better keeps the richer
    result (reference article_processor.py:153-251 semantics)."""
    from hinbox_ray.stages.mentions import MentionExtractor

    class Flaky(MentionExtractor):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.calls = 0

        def _run_extraction(self, text, repair_hint=None):
            self.calls += 1
            if self.calls == 1:
                # first attempt: model returned entities that QC then
                # dropped entirely → zero_entities flag
                self._last_raw_count = 3
                return []
            return super()._run_extraction(text, repair_hint)

    ext = Flaky()
    ents = ext._extract_doc_with_qc("Carol Rosenberg visited Guantanamo Bay.")
    assert ext.calls == 2  # retry happened
    assert {e["name"] for e in ents} == {"Carol Rosenberg", "Guantanamo Bay"}

    # retry disabled → the empty first attempt stands
    ext2 = Flaky(qc_retry=False)
    assert ext2._extract_doc_with_qc("Carol Rosenberg visited GTMO.") == []
    assert ext2.calls == 1


def test_qc_retry_noop_on_happy_path():
    from hinbox_ray.stages.mentions import MentionExtractor

    class Counting(MentionExtractor):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.calls = 0

        def _run_extraction(self, text, repair_hint=None):
            self.calls += 1
            return super()._run_extraction(text, repair_hint)

    ext = Counting()
    ents = ext._extract_doc_with_qc("Carol Rosenberg wrote about the FBI.")
    assert ext.calls == 1  # no severe flags → single attempt
    assert len(ents) == 2
    # a doc with no entities at all: raw count 0 → no zero_entities
    # retry storm on genuinely empty docs
    ext.calls = 0
    assert ext._extract_doc_with_qc("nothing relevant here") == []
    assert ext.calls == 1


def test_manifest_counts_irrelevant(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from hinbox_ray.sources.pages import generate_pages_table
    from hinbox_ray.state.lineage import extract_partition

    pages = generate_pages_table(40)
    # append pages with no gazetteer content
    extra = pa.table(
        {
            "url": pa.array([f"https://offtopic.example/{i}" for i in range(5)]),
            "warc_ts": pa.array(
                pages["warc_ts"].to_pylist()[:5], type=pa.timestamp("us")
            ),
            "html": pa.array(
                [b"<html><body><article><p>gardening tips and tricks</p></article></body></html>"] * 5,
                type=pa.binary(),
            ),
            "text": pa.array([""] * 5),
            "lang": pa.array(["en"] * 5),
        }
    )
    mixed = pa.concat_tables([pages, extra]).combine_chunks()
    src = tmp_path / "shard-0.parquet"
    pq.write_table(mixed, str(src))
    rec = extract_partition(str(src), str(tmp_path / "out"), concurrency=2)
    assert rec["n_irrelevant"] >= 5
    assert rec["n_docs"] == rec["n_docs"]  # present
