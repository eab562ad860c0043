"""End-to-end KG pipeline tests: resolution fidelity + the P/R gate."""

import pyarrow as pa
import pytest

from hinbox_ray.sources.pages import generate_pages_table

N_DOCS = 400


@pytest.fixture(scope="module")
def kg(ray_session):
    import ray.data as rd

    from hinbox_ray.pipelines.kg import build_kg

    pages = rd.from_arrow(generate_pages_table(N_DOCS))
    res = build_kg(pages, concurrency=2, batch_size=128, num_partitions=4)
    return {
        "triples": res.triples.to_pandas(),
        "entities": res.entities.to_pandas(),
    }


def test_triples_sorted_and_unique(kg):
    t = kg["triples"]
    rows = list(zip(t["subj"], t["pred"], t["obj"]))
    assert rows == sorted(rows)
    assert len(rows) == len(set(rows))


def test_acronym_and_equivalence_merges(kg):
    ents = kg["entities"]
    names = set(ents["name"])
    # ICE merged into its full form; FBI/CIA likewise
    assert "Immigration and Customs Enforcement" in names
    assert "ICE" not in names
    # Pentagon / DoD / Department of Defense are one entity
    dod = ents[ents["name"].isin(["Pentagon", "Department of Defense", "DoD"])]
    assert len(dod) == 1
    # GTMO group is one location
    gtmo = ents[ents["name"].isin(["Guantanamo Bay", "GTMO", "Guantánamo"])]
    assert len(gtmo) == 1


def test_must_not_merge_pairs(kg):
    ents = kg["entities"]
    names = list(ents["name"])
    # same-surname distinct people stay distinct
    assert sum(n.endswith("Miller") for n in names) == 2
    # sub-locations stay distinct
    assert "Camp Delta" in names and "Camp Echo" in names
    # low-quality generic stays separate from Department of Defense
    assert "defense departments" in names
    # same title, different date → two events
    csrt = ents[
        (ents["entity_type"] == "events")
        & (ents["name"] == "Combatant Status Review Tribunal hearing")
    ]
    assert set(csrt["start_date"]) == {"2004-07-30", "2005-03-15"}


def test_transliteration_people_merge(kg):
    ents = kg["entities"]
    q = ents[ents["name"].str.contains("al-Qahtani|al-Kahtani")]
    by_cluster = q[q["entity_type"] == "people"]
    # Mohammed variants merged; Jamal separate
    assert len(by_cluster) == 2


def test_mentioned_in_triples_reference_real_urls(kg):
    t = kg["triples"]
    m = t[t["pred"] == "mentioned_in"]
    assert len(m) > 0
    assert m["obj"].str.startswith("https://example.org/crawl/").all()
    # one link per (entity, url)
    assert not m.duplicated(["subj", "obj"]).any()


def test_precision_recall_vs_reference_oracle(kg):
    from hinbox_ray.pipelines.oracle import precision_recall, reference_triples

    pages_t = generate_pages_table(N_DOCS)
    oracle = reference_triples(pages_t)
    engine = pa.Table.from_pandas(kg["triples"])
    pr = precision_recall(engine, oracle)
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr


def test_deterministic_across_runs(ray_session, kg):
    import ray.data as rd

    from hinbox_ray.pipelines.kg import build_kg

    pages = rd.from_arrow(generate_pages_table(N_DOCS))
    res2 = build_kg(pages, concurrency=2, batch_size=64, num_partitions=2)
    t2 = res2.triples.to_pandas()
    t1 = kg["triples"]
    assert list(zip(t1["subj"], t1["pred"], t1["obj"])) == list(
        zip(t2["subj"], t2["pred"], t2["obj"])
    )


def test_write_kg_partitioned_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from hinbox_ray.pipelines.kg import build_kg, write_kg
    from hinbox_ray.sources.pages import generate_pages_table

    res = build_kg(rd.from_arrow(generate_pages_table(60)))
    out = write_kg(res, str(tmp_path))
    tri = pq.read_table(out["triples_dir"])
    assert set(tri.column_names) == {"subj", "pred", "obj"}
    assert tri.num_rows == res.triples.count()
    ents = pq.read_table(out["entities_dir"])
    assert "entity_id" in ents.column_names


def test_sorted_triples_are_globally_distinct(ray_session):
    """Dedup-after-sort correctness: with the salted dedup shuffle
    removed, the post-sort adjacent-distinct pass must leave no
    duplicate (subj, pred, obj) anywhere — including across block
    boundaries. The corpus plants the same entity via BOTH name
    variants in every doc, the worst case for mentioned_in dups."""
    import pyarrow as pa
    import ray.data as rd

    from hinbox_ray.pipelines.kg import build_kg

    n = 400
    html = (
        "<html><body><article><p>Mohammed al-Qahtani and Mohammed "
        "al-Kahtani and the FBI and the Federal Bureau of Investigation "
        "met at Guantanamo Bay near GTMO.</p></article></body></html>"
    ).encode()
    pages = pa.table(
        {
            "url": pa.array([f"https://dup.example/{i:05d}" for i in range(n)]),
            "warc_ts": pa.array([1_600_000_000_000_000 + i for i in range(n)],
                                type=pa.timestamp("us")),
            "html": pa.array([html] * n, type=pa.binary()),
            "text": pa.array([""] * n),
            "lang": pa.array(["en"] * n),
        }
    )
    res = build_kg(rd.from_arrow(pages), concurrency=2)
    df = res.triples.to_pandas()
    assert len(df) == len(df.drop_duplicates(["subj", "pred", "obj"]))
    # every doc linked exactly once per canonical entity
    m = df[df["pred"] == "mentioned_in"]
    per_pair = m.groupby(["subj", "obj"]).size()
    assert (per_pair == 1).all()
    # the variant pairs truly merged (worst case exercised)
    n_people = len(res.entities.to_pandas().query("entity_type == 'people'"))
    assert n_people == 1


def test_raw_entities_empty_corpus(ray_session):
    """ADVICE r3: a zero-mention corpus must reduce to a typed empty
    raw-entities frame, not crash on pd.concat([])."""
    import ray.data as rd

    from hinbox_ray.stages.mentions import MENTIONS_SCHEMA
    from hinbox_ray.stages.resolve import raw_entities

    empty = rd.from_arrow(MENTIONS_SCHEMA.empty_table())
    out = raw_entities(empty)
    assert out.count() == 0
    # the DATASET schema stays typed (to_pandas drops columns on 0 rows)
    names = out.schema().names
    assert "node_id" in names and "n_mentions" in names


def test_checkpoint_mentions_boundary_equivalent(ray_session, tmp_path):
    """The parquet mention checkpoint (round-5 scale fix for the 20M
    object-store spill) must produce the identical graph to the plasma
    materialize, and leave the checkpoint on disk for resume."""
    import os

    from hinbox_ray.pipelines.kg import build_kg
    from hinbox_ray.sources.planted import planted_pages_dataset

    sf = "/root/testdata/sf0.001"
    base = build_kg(planted_pages_dataset(sf)).triples.take_all()
    ckpt = build_kg(
        planted_pages_dataset(sf),
        checkpoint_mentions=True,
        checkpoint_dir=str(tmp_path),
    ).triples.take_all()
    assert base == ckpt
    files = os.listdir(tmp_path / "mentions")
    assert any(f.endswith(".parquet") for f in files)
