"""md5-planted flagship corpus (sources/planted.py): fixture soundness,
plant parity with DuckDB, containment blocking keys, and the three-way
engine == SQL-fixture == serial-reference-oracle agreement.

The driver-style value-hash comparison of kg_triples_planted /
kg_entities_planted against their oracle SQL runs in
test_queries_oracle.py (parametrized over oracle_sql()).
"""

from __future__ import annotations

import itertools

import duckdb
import pyarrow as pa
import pytest

from hinbox_ray.sources import planted as P


def test_fixture_winners_are_order_free():
    """Every multi-member planted cluster elects a permutation-
    independent canonical name, or (people, equal scores) always keeps
    its first-seen member — the two cases the oracle SQL handles."""
    for f in P.cluster_fixtures().values():
        if len(f.members) == 1:
            assert f.canon == f.members[0]
            continue
        winners = {
            p: P._walk_winner(list(p))
            for p in itertools.permutations(f.members)
        }
        if f.canon is not None:
            assert set(winners.values()) == {f.canon}, f.cluster
        else:
            assert all(w == p[0] for p, w in winners.items()), f.cluster


def test_excluded_surfaces_are_the_order_dependent_ones():
    """Pentagon and Guantánamo are excluded BECAUSE their full clusters
    elect order-dependently — re-derive that from the gazetteer so a
    config change invalidating the exclusion list fails loudly."""
    from hinbox_ray.config import GAZETTEER

    clusters: dict = {}
    for e in GAZETTEER:
        clusters.setdefault(e.cluster, []).append(e.surface)
    for excl in P._ORDER_DEPENDENT_SURFACES:
        members = next(
            sorted(set(v)) for v in clusters.values() if excl in v
        )
        winners = {
            P._walk_winner(list(p))
            for p in itertools.permutations(members)
        }
        firsts = all(
            P._walk_winner(list(p)) == p[0]
            for p in itertools.permutations(members)
        )
        assert len(winners) > 1 and not firsts, excl


def test_plant_plan_matches_duckdb():
    """plant_indices == the SQL derivation (round-robin + md5 slot)."""
    n = len(P.PLANTED)
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT doc_id,
               (2 * doc_id) % {n},
               (2 * doc_id + 1) % {n},
               CAST(md5_number_lower('plant:' || CAST(doc_id AS VARCHAR))
                    % {n} AS BIGINT)
        FROM range(0, 200) t(doc_id) ORDER BY doc_id
        """
    ).fetchall()
    for doc_id, a, b, c in rows:
        assert P.plant_indices(doc_id) == [a, b, c]


def test_containment_blocking_keys():
    """Whole-name containment pairs share a c: key (the recall gap the
    planted oracle exposed: without it, 'Homeland Security' merges with
    its full form only when both co-occur in one document)."""
    from hinbox_ray.functions.matching import blocking_keys

    short = set(blocking_keys("organizations", "Homeland Security", []))
    long_ = set(
        blocking_keys("organizations", "Department of Homeland Security", [])
    )
    assert "org|c:homeland security" in short & long_
    # single-token names get no per-token span keys (hot-block guard)
    pent = blocking_keys("organizations", "Pentagon", [])
    assert not any(k.startswith("org|c:") for k in pent)
    # all-stopword spans are skipped
    icrc = blocking_keys(
        "organizations", "International Committee of the Red Cross", []
    )
    assert "org|c:of the" not in icrc
    # people never get containment keys (surname blocks would be hot)
    assert not any(
        k.startswith("peo|c:")
        for k in blocking_keys("people", "Mohammed al-Qahtani", [])
    )


def test_planted_engine_matches_reference_semantics(ray_session):
    """Three-way closure: the distributed pipeline's triples over the
    planted corpus equal the SERIAL reference-semantics oracle's
    (greedy store merge, pipelines/oracle.py) — so the SQL fixture, the
    Ray graph, and hinbox's merge semantics all agree."""
    import ray.data

    from hinbox_ray.pipelines.kg import build_kg
    from hinbox_ray.pipelines.oracle import precision_recall, reference_triples

    n_docs = 120  # > 2 * len(PLANTED): full surface coverage
    pages_tbl = P.planted_pages_batch(
        pa.table({"doc_id": pa.array(range(n_docs), type=pa.int64())})
    )
    engine = build_kg(ray.data.from_arrow(pages_tbl)).triples.to_arrow_refs()
    import ray as _ray

    engine_tbl = pa.concat_tables(_ray.get(engine))
    oracle_tbl = reference_triples(pages_tbl)
    pr = precision_recall(engine_tbl, oracle_tbl)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, pr
