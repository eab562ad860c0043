"""Synthetic corpus generator tests: determinism, schema, invariant, skew."""

import pyarrow as pa

from hinbox_ray.config import GAZETTEER
from hinbox_ray.functions.html_text import extract_article
from hinbox_ray.sources.pages import (
    PAGES_SCHEMA,
    generate_pages_table,
    synthesize_page,
    write_pages_parquet,
)


def test_schema_matches_north_rule():
    t = generate_pages_table(8)
    assert t.schema.equals(PAGES_SCHEMA)
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"
    assert t.schema.field("html").type == pa.binary()


def test_deterministic_regeneration():
    a = generate_pages_table(50)
    b = generate_pages_table(50)
    assert a.equals(b)


def test_urls_unique_and_sorted():
    t = generate_pages_table(200)
    urls = t.column("url").to_pylist()
    assert len(set(urls)) == 200
    assert urls == sorted(urls)


def test_text_column_is_extraction_oracle():
    t = generate_pages_table(64)
    for html, text in zip(t.column("html").to_pylist(), t.column("text").to_pylist()):
        assert extract_article(html.decode("utf-8"))[1] == text


def test_hot_key_skew_present():
    """The 'United States' equivalence group should be hot (~10%+ of docs)."""
    n = 400
    hot = 0
    for i in range(n):
        text = synthesize_page(i)["text"]
        if "United States" in text or "U.S." in text or "USA" in text:
            hot += 1
    assert hot > n * 0.10


def test_language_mix():
    t = generate_pages_table(400)
    langs = t.column("lang").to_pylist()
    assert langs.count("en") > 300
    assert any(l in ("de", "es") for l in langs)


def test_gazetteer_mentions_actually_planted():
    surfaces = {e.surface for e in GAZETTEER}
    found = set()
    for i in range(300):
        text = synthesize_page(i)["text"]
        for s in surfaces:
            if s in text:
                found.add(s)
    # the vast majority of gazetteer surfaces appear somewhere in 300 docs
    assert len(found) > len(surfaces) * 0.6


def test_write_pages_parquet_sharding(tmp_path):
    paths = write_pages_parquet(str(tmp_path), n=100, num_shards=4)
    assert len(paths) == 4
    import pyarrow.parquet as pq

    total = sum(pq.read_metadata(p).num_rows for p in paths)
    assert total == 100
