"""Content-addressed extraction memo (reference S7 semantics)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from hinbox_ray.state.memo import extract_with_memo, memo_key


def _docs(texts, start=0):
    n = len(texts)
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    [f"https://ex.org/{start + i}" for i in range(n)]
                ),
                "warc_ts": pa.array([None] * n, type=pa.timestamp("us")),
                "text": pa.array(texts),
            }
        )
    )


TEXTS = [
    "Carol Rosenberg reported from Guantanamo Bay.",
    "The FBI and the CIA disagreed.",
    "Nothing entity-like in this one.",
    "Mohammed al-Qahtani appeared before the Combatant Status Review Tribunal hearing on 2004-07-30.",
]


def test_memo_key_sensitivity():
    """Key changes with content, cache version, and model/domain — the
    reference's key-sensitivity contract (extraction_cache tests)."""
    from hinbox_ray.config import DomainConfig

    k = memo_key("abc")
    assert k == memo_key("abc")
    assert k != memo_key("abd")
    assert k != memo_key("abc", version=2)

    class OtherDomain(DomainConfig):
        pass

    other = DomainConfig(domain="other")
    assert k != memo_key("abc", other)


def test_first_run_all_miss_then_all_hit(ray_session, tmp_path):
    from hinbox_ray.stages.mentions import extract_mentions

    memo = str(tmp_path / "memo")
    docs = _docs(TEXTS)

    m1, s1 = extract_with_memo(docs, memo, concurrency=2)
    df1 = m1.to_pandas().sort_values(["url", "doc_ord"]).reset_index(drop=True)
    assert s1 == {"hits": 0, "misses": 4}

    # parity with the plain extractor
    plain = (
        extract_mentions(_docs(TEXTS), concurrency=2)
        .to_pandas()
        .sort_values(["url", "doc_ord"])
        .reset_index(drop=True)
    )
    assert df1[["url", "name", "entity_type"]].equals(
        plain[["url", "name", "entity_type"]]
    )

    # second run: every doc hits, replayed mentions identical
    m2, s2 = extract_with_memo(_docs(TEXTS), memo, concurrency=2)
    assert s2 == {"hits": 4, "misses": 0}
    df2 = m2.to_pandas().sort_values(["url", "doc_ord"]).reset_index(drop=True)
    assert df1[["url", "name", "entity_type", "n_mentions"]].equals(
        df2[["url", "name", "entity_type", "n_mentions"]]
    )


def test_modified_doc_reextracts_only_changed(ray_session, tmp_path):
    memo = str(tmp_path / "memo")
    extract_with_memo(_docs(TEXTS), memo, concurrency=2)

    changed = list(TEXTS)
    changed[1] = "The FBI raided a Miami office."  # same url, new content
    m, s = extract_with_memo(_docs(changed), memo, concurrency=2)
    assert s == {"hits": 3, "misses": 1}
    names = set(m.to_pandas()["name"])
    assert "Miami" in names  # the fresh extraction ran on the new text
    assert "Carol Rosenberg" in names  # replayed from memo


def test_zero_mention_doc_hits_next_time(ray_session, tmp_path):
    memo = str(tmp_path / "memo")
    _, s1 = extract_with_memo(_docs(["no entities here"]), memo, concurrency=2)
    assert s1 == {"hits": 0, "misses": 1}
    m2, s2 = extract_with_memo(_docs(["no entities here"]), memo, concurrency=2)
    assert s2 == {"hits": 1, "misses": 0}
    assert m2.count() == 0


def test_replay_reattaches_to_current_doc(ray_session, tmp_path):
    """A doc whose content matches a memoized doc at a DIFFERENT url
    must get the replayed mentions attributed to ITS OWN url/warc_ts —
    the reference sidecar reattaches cached results to the current
    article (ADVICE r2: duplicate-content docs are common in web
    corpora)."""
    memo = str(tmp_path / "memo")
    text = TEXTS[0]
    extract_with_memo(_docs([text], start=0), memo, concurrency=2)

    # same content, new url (start=100 → https://ex.org/100)
    m2, s2 = extract_with_memo(_docs([text], start=100), memo, concurrency=2)
    assert s2 == {"hits": 1, "misses": 0}
    df = m2.to_pandas()
    assert len(df) > 0
    assert set(df["url"]) == {"https://ex.org/100"}
    assert "Carol Rosenberg" in set(df["name"])

    # and BOTH same-content docs in one run each get their own copy
    m3, s3 = extract_with_memo(
        _docs([text, text], start=200), memo, concurrency=2
    )
    assert s3 == {"hits": 2, "misses": 0}
    df3 = m3.to_pandas()
    assert set(df3["url"]) == {"https://ex.org/200", "https://ex.org/201"}
    per_url = df3.groupby("url")["name"].apply(set)
    assert per_url["https://ex.org/200"] == per_url["https://ex.org/201"]


def test_duplicated_data_files_replay_once(ray_session, tmp_path):
    """The append-only data dir can hold a key's rows twice (concurrent
    runs / crash between data and index append) — replay must dedup."""
    import os
    import shutil

    memo = str(tmp_path / "memo")
    m1, _ = extract_with_memo(_docs(TEXTS[:1]), memo, concurrency=2)
    n1 = m1.count()
    data_dir = os.path.join(memo, "data")
    for f in os.listdir(data_dir):
        shutil.copyfile(
            os.path.join(data_dir, f), os.path.join(data_dir, "dup-" + f)
        )
    m2, s2 = extract_with_memo(_docs(TEXTS[:1]), memo, concurrency=2)
    assert s2 == {"hits": 1, "misses": 0}
    assert m2.count() == n1


def test_cache_version_bump_invalidates(ray_session, tmp_path):
    memo = str(tmp_path / "memo")
    extract_with_memo(_docs(TEXTS[:2]), memo, concurrency=2)
    _, s = extract_with_memo(_docs(TEXTS[:2]), memo, concurrency=2, version=2)
    assert s == {"hits": 0, "misses": 2}
