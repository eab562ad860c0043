"""md5-planted pages: the SQL-expressible flagship corpus.

``sources/pages.py`` stresses the extractor with splitmix64-driven
templates — deliberately NOT reproducible in SQL, so the driver's
correctness gate can only count rows for ``kg_triples``. This module is
the oracle-able sibling: every planted mention derives from
``md5(doc_id)`` and round-robin arithmetic, both of which DuckDB
expresses exactly (``md5_number_lower``, modulo). The REAL flagship
pipeline (fused html→text → actor-pool mention extraction → within-doc
QC/collapse → blocking → pair verification → connected components →
canonical election → triple emission → global sort) runs unchanged on
the Ray side; the DuckDB oracle independently derives the ground-truth
triple set from the plant plan plus a corpus-independent gazetteer
fixture. Any over-merge, under-merge, lost mention, wrong canonical
name, missed alias, or dedup/sort bug changes the value hash.

Plant plan (per doc, 3 sentences):
    slot 0: gazetteer-subset index (2*doc_id)     % N   (coverage)
    slot 1: gazetteer-subset index (2*doc_id + 1) % N   (coverage)
    slot 2: md5_number_lower('plant:' || doc_id)  % N   (mixing)
Round-robin slots guarantee every surface appears once per N/2 docs, so
the canonical-election fixture below is exercised with full alias
context at every test scale (sf0.001 = 500 docs >> 2N).

Why a SUBSET of the gazetteer: the canonical election (serial greedy
swap with a 0.3 margin, stages/canonical._elect) makes some clusters'
winners depend on corpus arrival order — {"Department of Defense",
"Pentagon", "DoD"} elects whichever of the two non-acronym forms the
corpus sees first (Δscore 0.26 < margin), and {"Guantanamo Bay",
"Guantánamo"} likewise (accent blocks the containment bonus). Those two
order-dependent SURFACES ("Pentagon", "Guantánamo") are excluded here
so every org/loc/event cluster has a permutation-independent winner
(pinned by tests/test_planted.py::test_fixture_winners_are_order_free);
they stay covered by the splitmix corpus and its P/R gate. The one
people cluster with two equal-scoring transliteration variants
(p_qahtani_m) can never swap, so its winner is simply the first-seen
member — which IS SQL-derivable (min (doc_id, slot) over plants, since
people mentions don't collapse within a doc) and is handled by the
oracle as the corpus-dependent branch.

Reference parity: the flagship semantics being checked are hinbox's
merge/canonicalization rules (src/engine/mergers.py:231-274,707-1258);
this corpus only makes them machine-checkable end-to-end via DuckDB.
"""

from __future__ import annotations

import hashlib
import itertools
from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from ..config import GAZETTEER, GazEntry
from ..functions.hashing import entity_id as make_entity_id
from ..functions.names import (
    canonical_score_with_bonuses,
    normalize_display,
    score_canonical_name,
)

_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z (pages.py epoch)
_SWAP_MARGIN = 0.3  # stages/canonical._SWAP_MARGIN

# Surfaces whose cluster's canonical election is arrival-order-dependent
# (see module docstring). Excluded from the planted subset.
_ORDER_DEPENDENT_SURFACES = frozenset({"Pentagon", "Guantánamo"})

#: The planted subset, in gazetteer order. Index into THIS list is the
#: plant index both engines compute.
PLANTED: List[GazEntry] = [
    e for e in GAZETTEER if e.surface not in _ORDER_DEPENDENT_SURFACES
]


def md5_lower64(s: str) -> int:
    """== DuckDB ``md5_number_lower(s)``: md5 digest bytes [8:16], LE."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def plant_indices(doc_id: int) -> List[int]:
    """The 3 planted-subset indices for a doc (slot order)."""
    n = len(PLANTED)
    return [
        (2 * doc_id) % n,
        (2 * doc_id + 1) % n,
        md5_lower64(f"plant:{doc_id}") % n,
    ]


def _surface_text(entry: GazEntry) -> str:
    """Plantable surface; events carry the date inline so the extractor
    recovers the (title, start_date) key (pages.py:_surface_text)."""
    if entry.entity_type == "events" and entry.attrs.get("start_date"):
        return f"{entry.surface} on {entry.attrs['start_date']}"
    return entry.surface


def planted_text(doc_id: int) -> str:
    return " ".join(
        f"{_surface_text(PLANTED[i])} appeared in the filing."
        for i in plant_indices(doc_id)
    )


def page_url(doc_id: int) -> str:
    return f"doc://{doc_id:08d}"


def planted_pages_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id) batch → pages batch with the north-rule schema
    (url, warc_ts, html, text, lang). html wraps the planted sentences
    in the plain <article><p> template so the fused extractor's
    html→text kernel runs for real."""
    doc_ids = batch.column("doc_id").to_pylist()
    urls, tss, htmls, texts = [], [], [], []
    for d in doc_ids:
        d = int(d)
        text = planted_text(d)
        urls.append(page_url(d))
        tss.append(_EPOCH_US + d)
        htmls.append(
            f"<html><head><title>t{d}</title></head><body>"
            f"<article><p>{text}</p></article></body></html>".encode("utf-8")
        )
        texts.append(text)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * len(urls), type=pa.string()),
        }
    )


def planted_pages_dataset(sf_dir: str):
    """Pruned documents read → deterministic planted pages Dataset."""
    from .reader import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id"]
    )
    return ds.map_batches(planted_pages_batch, batch_format="pyarrow")


# ──────────────────────────────────────────────
# Ground-truth fixture (corpus-independent part)
# ──────────────────────────────────────────────


@dataclass(frozen=True)
class ClusterFixture:
    cluster: str
    entity_type: str
    members: Tuple[str, ...]          # normalized display names, gaz order
    canon: Optional[str]              # None → first-seen (qahtani branch)
    attr_type: str
    event_type: str
    start_date: str
    end_date: str

    def eid_for(self, canon: str) -> str:
        if self.entity_type == "people":
            key = canon
        elif self.entity_type in ("organizations", "locations"):
            key = f"{canon}\x1f{self.attr_type}"
        else:
            key = f"{canon}\x1f{self.start_date}"
        return make_entity_id(self.entity_type, key)


def _walk_winner(order: List[str]) -> str:
    """The canonical-election walk of stages/canonical._elect, names
    only (arrival aliases empty — raw planted nodes carry none beyond
    other members, which the absorb context reproduces)."""
    canon = order[0]
    aliases: List[str] = []

    def absorb(v: str) -> None:
        low = {a.lower() for a in aliases} | {canon.lower()}
        if v and v.lower() not in low:
            aliases.append(v)

    for m in order[1:]:
        existing = canonical_score_with_bonuses(canon, [m, *aliases])
        incoming = canonical_score_with_bonuses(m, [canon, *aliases])
        if incoming > existing + _SWAP_MARGIN:
            demoted = canon
            canon = m
            absorb(demoted)
        else:
            absorb(m)
    return canon


@lru_cache(maxsize=1)
def cluster_fixtures() -> Dict[str, ClusterFixture]:
    """Per-cluster ground truth over the PLANTED subset.

    ``canon`` is the permutation-independent election winner; clusters
    where every permutation elects its first member (equal scores, no
    swap possible) get ``canon=None`` and are resolved per-corpus by
    first-seen order (the oracle SQL derives the same). A cluster that
    is neither constant nor first-seen would be a fixture bug —
    asserted here, and again from tests.
    """
    groups: Dict[str, List[GazEntry]] = {}
    for e in PLANTED:
        groups.setdefault(e.cluster, []).append(e)

    out: Dict[str, ClusterFixture] = {}
    for cluster, entries in groups.items():
        etype = entries[0].entity_type
        members = tuple(
            dict.fromkeys(normalize_display(e.surface) for e in entries)
        )
        # event attrs follow the extractor's first-entry-per-surface rule
        # (stages/mentions.py:107-113); start_date is the planted date.
        first = entries[0]
        attr_type = str(first.attrs.get("type", ""))
        event_type = str(first.attrs.get("event_type", ""))
        start_date = (
            str(first.attrs.get("start_date", "")) if etype == "events" else ""
        )
        end_date = str(first.attrs.get("end_date", "")) if etype == "events" else ""

        if len(members) == 1:
            canon: Optional[str] = members[0]
        else:
            winners = {
                _walk_winner(list(p)): None
                for p in itertools.permutations(members)
            }
            if len(winners) == 1:
                canon = next(iter(winners))
            else:
                firsts = all(
                    _walk_winner(list(p)) == p[0]
                    for p in itertools.permutations(members)
                )
                assert firsts, (
                    f"cluster {cluster} is neither order-free nor "
                    f"first-seen: {sorted(winners)}"
                )
                canon = None
        out[cluster] = ClusterFixture(
            cluster=cluster,
            entity_type=etype,
            members=members,
            canon=canon,
            attr_type=attr_type,
            event_type=event_type,
            start_date=start_date,
            end_date=end_date,
        )
    return out


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _gaz_values() -> str:
    """(idx, display, cluster, score_rank) VALUES rows for the subset.

    score_rank ranks surfaces within a cluster by descending
    ``score_canonical_name`` — the within-doc variant-collapse survivor
    (stages/mentions._collapse_variants keeps the higher-scoring name)
    is rank 0 among the surfaces co-present in a doc.
    """
    fixtures = cluster_fixtures()
    rows = []
    for idx, e in enumerate(PLANTED):
        disp = normalize_display(e.surface)
        members = fixtures[e.cluster].members
        rank = sorted(members, key=lambda m: -score_canonical_name(m)).index(disp)
        rows.append(
            f"({idx}, {_sql_quote(disp)}, {_sql_quote(e.cluster)}, {rank})"
        )
    return ",\n        ".join(rows)


def _clus_values() -> str:
    """(cluster, etype, canon, eid, attr_type, event_type, start_date,
    end_date, collapses) VALUES rows. First-seen clusters carry canon ''
    and eid '' (resolved in SQL); ``collapses`` marks org/loc clusters
    whose within-doc variant collapse drops the loser's mention count.
    """
    rows = []
    for f in cluster_fixtures().values():
        canon = f.canon or ""
        eid = f.eid_for(f.canon) if f.canon else ""
        collapses = (
            1
            if f.entity_type in ("organizations", "locations")
            and len(f.members) > 1
            else 0
        )
        rows.append(
            "("
            + ", ".join(
                [
                    _sql_quote(f.cluster),
                    _sql_quote(f.entity_type),
                    _sql_quote(canon),
                    _sql_quote(eid),
                    _sql_quote(f.attr_type),
                    _sql_quote(f.event_type),
                    _sql_quote(f.start_date),
                    _sql_quote(f.end_date),
                    str(collapses),
                ]
            )
            + ")"
        )
    return ",\n        ".join(rows)


def _first_seen_eid_case() -> str:
    """CASE mapping each first-seen cluster's elected member → eid."""
    cases = []
    for f in cluster_fixtures().values():
        if f.canon is not None:
            continue
        for m in f.members:
            cases.append(
                f"WHEN c.cluster = {_sql_quote(f.cluster)} AND "
                f"fs.canon = {_sql_quote(m)} THEN {_sql_quote(f.eid_for(m))}"
            )
    return " ".join(cases)


def _plants_cte(doc_filter: str = "") -> str:
    """doc_filter: optional SQL predicate (e.g. "doc_id % 5 != 0") to
    derive the ground truth for a SUBSET corpus — the increment-diff
    oracle uses it; empty = all docs (every existing oracle)."""
    n = len(PLANTED)
    where = f" WHERE {doc_filter}" if doc_filter else ""
    return f"""
    docs AS (SELECT doc_id FROM documents{where}),
    plants AS (
        SELECT doc_id, 0 AS slot, (2 * doc_id) % {n} AS idx FROM docs
        UNION ALL
        SELECT doc_id, 1, (2 * doc_id + 1) % {n} FROM docs
        UNION ALL
        SELECT doc_id, 2,
               CAST(md5_number_lower('plant:' || CAST(doc_id AS VARCHAR))
                    % {n} AS BIGINT)
        FROM docs
    ),
    gaz(idx, display, cluster, score_rank) AS (VALUES
        {_gaz_values()}
    ),
    clus(cluster, etype, canon0, eid0, attr_type, event_type,
         start_date, end_date, collapses) AS (VALUES
        {_clus_values()}
    ),
    pm AS (
        SELECT p.doc_id, p.slot, g.display, g.cluster, g.score_rank
        FROM plants p JOIN gaz g ON g.idx = p.idx
    ),
    fseen AS (
        -- first-seen member per first-seen cluster (people never
        -- collapse within a doc, so plant order IS mention order)
        SELECT cluster, display AS canon,
               ROW_NUMBER() OVER (
                   PARTITION BY cluster
                   ORDER BY MIN(doc_id * 4 + slot), display
               ) AS rn
        FROM pm
        WHERE cluster IN (SELECT cluster FROM clus WHERE canon0 = '')
        GROUP BY cluster, display
    ),
    clus2 AS (
        SELECT c.cluster, c.etype,
               CASE WHEN c.canon0 = '' THEN fs.canon ELSE c.canon0 END AS canon,
               CASE WHEN c.canon0 = ''
                    THEN CASE {_first_seen_eid_case()} END
                    ELSE c.eid0 END AS eid,
               c.attr_type, c.event_type, c.start_date, c.end_date,
               c.collapses
        FROM clus c
        LEFT JOIN (SELECT * FROM fseen WHERE rn = 1) fs USING (cluster)
        WHERE c.canon0 <> '' OR fs.canon IS NOT NULL
    )"""


def triples_oracle_sql(doc_filter: str = "") -> str:
    """DuckDB SQL deriving the ground-truth (subj, pred, obj) set of
    ``kg_triples_planted`` from the documents table alone (optionally
    for the doc subset matching ``doc_filter``)."""
    return f"""
    WITH {_plants_cte(doc_filter)},
    pres AS (SELECT DISTINCT cluster FROM pm),
    alias_rows AS (SELECT DISTINCT cluster, display FROM pm),
    urls AS (
        SELECT DISTINCT
               'doc://' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url,
               cluster
        FROM pm
    ),
    triples AS (
        SELECT c.eid AS subj, 'rdf:type' AS pred, c.etype AS obj
        FROM clus2 c JOIN pres USING (cluster)
        UNION ALL
        SELECT c.eid, 'name', c.canon FROM clus2 c JOIN pres USING (cluster)
        UNION ALL
        SELECT c.eid, 'alias', a.display
        FROM alias_rows a JOIN clus2 c USING (cluster)
        WHERE lower(a.display) <> lower(c.canon)
        UNION ALL
        SELECT c.eid, 'type', c.attr_type
        FROM clus2 c JOIN pres USING (cluster)
        WHERE c.etype IN ('organizations', 'locations') AND c.attr_type <> ''
        UNION ALL
        SELECT c.eid, 'event_type', c.event_type
        FROM clus2 c JOIN pres USING (cluster)
        WHERE c.etype = 'events' AND c.event_type <> ''
        UNION ALL
        SELECT c.eid, 'start_date', c.start_date
        FROM clus2 c JOIN pres USING (cluster)
        WHERE c.etype = 'events' AND c.start_date <> ''
        UNION ALL
        SELECT c.eid, 'end_date', c.end_date
        FROM clus2 c JOIN pres USING (cluster)
        WHERE c.etype = 'events' AND c.end_date <> ''
        UNION ALL
        SELECT c.eid, 'mentioned_in', u.url
        FROM urls u JOIN clus2 c USING (cluster)
    )
    SELECT DISTINCT subj, pred, obj FROM triples ORDER BY subj, pred, obj
    """


# ──────────────────────────────────────────────
# Round 5: planted oracles for profiles / grounding / pair verdicts
# (A4–A7 value-hash-checked the way A1/J2/D3 already are)
# ──────────────────────────────────────────────

_MAX_VERSIONS = 8  # stages/profiles.entity_profiles default
_GRAY_BAND = 0.05  # reference: src/constants.py:29-33


def _rawsf_values() -> str:
    """(idx, stext) VALUES rows: the raw plantable sentence fragment per
    planted index (events carry the inline date) — lets DuckDB rebuild
    every doc's exact extracted text for the grounding substring check."""
    return ",\n        ".join(
        f"({idx}, {_sql_quote(_surface_text(e))})"
        for idx, e in enumerate(PLANTED)
    )


def _profiles_cte() -> str:
    """CTEs (appended after ``_plants_cte()``) deriving one profile row
    per planted entity: the deterministic profile kernel
    (stages/profiles.profile_kernel — reference contract
    src/engine/profiles.py:85-102) is closed-form over the plant plan,
    so DuckDB rebuilds the cited text, source list and version ladder
    arithmetic from the documents table alone."""
    return f"""
    firstn AS (
        SELECT cluster, doc_id FROM (
            SELECT cluster, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY cluster ORDER BY doc_id
                   ) AS rn
            FROM (SELECT DISTINCT cluster, doc_id FROM pm)
        ) WHERE rn <= {_MAX_VERSIONS}
    ),
    prof AS (
        SELECT c.cluster, c.eid, c.etype, c.canon,
               CASE c.etype WHEN 'people' THEN 'person'
                    WHEN 'organizations' THEN 'organization'
                    WHEN 'locations' THEN 'location'
                    WHEN 'events' THEN 'event' ELSE c.etype END AS kind,
               COUNT(*) AS n,
               string_agg(c.canon || ' ^[doc://' ||
                          lpad(CAST(f.doc_id AS VARCHAR), 8, '0') || ']',
                          ' ' ORDER BY f.doc_id) AS cited,
               string_agg('doc://' || lpad(CAST(f.doc_id AS VARCHAR), 8, '0'),
                          chr(31) ORDER BY f.doc_id) AS sources
        FROM firstn f JOIN clus2 c USING (cluster)
        GROUP BY c.cluster, c.eid, c.etype, c.canon
    ),
    prof2 AS (
        SELECT *, cited || ' — ' || kind || ' profile.' AS profile_text
        FROM prof
    )"""


def profiles_oracle_sql() -> str:
    """DuckDB SQL for ``kg_profiles_planted``: the versioned-profile
    stage's scalar projection (text, confidence, source list, version
    counter, reflection counter, text hash) per canonical entity."""
    return f"""
    WITH {_plants_cte()}, {_profiles_cte()}
    SELECT eid AS entity_id, etype AS entity_type, canon AS name,
           profile_text,
           CAST(LEAST(95, 50 + 5 * n) AS BIGINT) AS confidence_e2,
           CAST(n AS BIGINT) AS n_sources,
           CAST(n AS BIGINT) AS current_version,
           sources,
           sha256(profile_text) AS profile_hash,
           CAST(n AS BIGINT) AS reflection_attempts
    FROM prof2 ORDER BY entity_id
    """


def grounding_oracle_sql() -> str:
    """DuckDB SQL for ``kg_grounding_planted``: rebuilds each cited
    doc's extracted text from the plant plan and replays the
    substring-support verifier + grounding-report arithmetic
    (functions/citations.grounding_summary — reference
    src/utils/quality_controls.py:718-748). verified < total happens
    exactly when a cited doc planted only a non-canonical surface of
    the cluster, so the counts are corpus-derived, not constant."""
    return f"""
    WITH {_plants_cte()}, {_profiles_cte()},
    rawsf(idx, stext) AS (VALUES
        {_rawsf_values()}
    ),
    doctext AS (
        SELECT p.doc_id,
               string_agg(r.stext || ' appeared in the filing.', ' '
                          ORDER BY p.slot) AS txt
        FROM plants p JOIN rawsf r USING (idx)
        WHERE p.doc_id IN (SELECT DISTINCT doc_id FROM firstn)
        GROUP BY p.doc_id
    ),
    supports AS (
        SELECT f.cluster,
               CASE WHEN position(lower(c.canon) IN lower(d.txt)) > 0
                    THEN 1 ELSE 0 END AS ok
        FROM firstn f
        JOIN clus2 c USING (cluster)
        JOIN doctext d USING (doc_id)
    ),
    rep AS (
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(ok) AS BIGINT) AS verified
        FROM supports GROUP BY cluster
    )
    SELECT p.eid AS entity_id,
           sha256(p.profile_text) AS profile_hash,
           r.total AS total_citations,
           r.verified,
           CAST(r.total - r.verified AS BIGINT) AS unverified,
           CAST(0 AS BIGINT) AS missing_source,
           CAST(FLOOR(CAST(r.verified AS DOUBLE) / r.total * 10000 + 0.5)
                AS BIGINT) AS grounding_score_e4,
           (CAST(r.verified AS DOUBLE) / r.total >= 0.5) AS passed,
           CASE WHEN r.verified = r.total THEN ''
                WHEN CAST(r.verified AS DOUBLE) / r.total >= 0.5
                     THEN 'unsupported_claims'
                ELSE 'unsupported_claims,low_grounding_score' END AS flags
    FROM rep r JOIN prof2 p USING (cluster)
    ORDER BY entity_id
    """


def _pair_verdict(cfg, etype: str, name_a: str, name_b: str,
                  sd_a: str, sd_b: str) -> str:
    """Reimplementation of the match-check → dispute ladder over a name
    pair (reference rules: src/engine/match_checker.py:201-322; gray
    band src/constants.py:29-33; low-quality guard
    src/engine/mergers.py:834-847) — deliberately written here, not
    imported from stages/verify, so the fixture derivation stays
    independent of the pipeline under test (same pattern as
    ``_walk_winner``). Alias context omitted: on the planted vocabulary
    the alias bridge never flips a verdict (asserted in
    ``verdict_fixture`` against the engine predicate at both alias
    extremes; the bridge is monotone, so equality at the extremes
    covers every reachable alias subset)."""
    from ..functions.matching import cosine_names
    from ..functions.names import (
        is_low_quality_name,
        lexical_ratio,
        names_likely_same,
        normalize_for_match,
    )

    na, nb = normalize_for_match(name_a), normalize_for_match(name_b)
    lowq = is_low_quality_name(name_a) or is_low_quality_name(name_b)
    if etype == "events" and sd_a and sd_b and sd_a != sd_b:
        match = False
    elif na == nb:
        match = True
    elif lowq:
        match = False
    elif names_likely_same(
        name_a, name_b, entity_type=etype,
        equivalence_groups=cfg.groups_for(etype),
    ):
        match = True
    else:
        match = (
            lexical_ratio(name_a, name_b) >= cfg.blocking.lexical_cutoff
            and cosine_names(name_a, name_b, cfg.embedding_dim)
            >= cfg.threshold(etype)
        )
    if match:
        return "MATCH"
    if lowq:
        return "SKIP"
    cos = cosine_names(name_a, name_b, cfg.embedding_dim)
    if abs(cos - cfg.threshold(etype)) <= _GRAY_BAND:
        return "DEFER"
    return "SKIP"


@lru_cache(maxsize=1)
def verdict_fixture() -> Tuple[Tuple[str, str, str, str, str, int, int, str], ...]:
    """(etype, name_u, sd_u, name_v, sd_v, idx_u, idx_v, verdict) for
    every within-type node pair over the planted vocabulary, oriented
    by (name, start_date). Corpus-independent by construction; the
    corpus-dependent part (which nodes exist) is a presence join the
    oracle SQL derives from the plants table.

    Two invariants asserted here (fixture bugs fail loudly, and
    tests/test_planted.py re-asserts them):
    - the reimplemented ladder's MATCH set equals the engine predicate
      ``mentions_match`` under BOTH empty and maximal (full
      same-cluster) alias contexts — alias monotonicity then covers
      every alias set the collapse can actually produce;
    - no cross-cluster org/loc pair is ``names_likely_same`` (so the
      within-doc collapse can never leak an alias across clusters).
    """
    from ..config import DomainConfig
    from ..functions.matching import mentions_match
    from ..functions.names import names_likely_same

    cfg = DomainConfig()
    nodes = []
    for idx, e in enumerate(PLANTED):
        nodes.append(
            (
                e.entity_type,
                normalize_display(e.surface),
                str(e.attrs.get("start_date", ""))
                if e.entity_type == "events"
                else "",
                idx,
                e.cluster,
            )
        )
    members: Dict[str, List[str]] = {}
    for et, name, sd, idx, cluster in nodes:
        members.setdefault(cluster, []).append(name)

    by_type: Dict[str, List] = {}
    for n in nodes:
        by_type.setdefault(n[0], []).append(n)

    out = []
    for et in sorted(by_type):
        ns = sorted(by_type[et], key=lambda n: (n[1], n[2]))
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                (_, nu, su, iu, cu) = ns[i]
                (_, nv, sv, iv, cv) = ns[j]
                verdict = _pair_verdict(cfg, et, nu, nv, su, sv)
                empty = mentions_match(
                    et, nu, nv, start_date_a=su, start_date_b=sv, cfg=cfg
                )
                full = mentions_match(
                    et, nu, nv, start_date_a=su, start_date_b=sv,
                    aliases_a=[m for m in members[cu] if m != nu],
                    aliases_b=[m for m in members[cv] if m != nv],
                    cfg=cfg,
                )
                assert empty == full == (verdict == "MATCH"), (
                    f"alias context flips verdict for ({nu!r}, {nv!r}): "
                    f"empty={empty} full={full} fixture={verdict}"
                )
                if (
                    et in ("organizations", "locations")
                    and cu != cv
                ):
                    assert not names_likely_same(
                        nu, nv, entity_type=et,
                        equivalence_groups=cfg.groups_for(et),
                    ), f"cross-cluster collapse possible: {nu!r} ~ {nv!r}"
                out.append((et, nu, su, nv, sv, iu, iv, verdict))
    return tuple(out)


def verdicts_oracle_sql() -> str:
    """DuckDB SQL for ``kg_pair_verdicts_planted``: the fixture verdict
    table joined against node presence derived from the plant plan —
    the corpus decides WHICH pairs exist, the fixture (asserted against
    the engine predicate, see ``verdict_fixture``) decides the label."""
    rows = ",\n        ".join(
        f"({_sql_quote(et)}, {_sql_quote(nu)}, {_sql_quote(su)}, "
        f"{_sql_quote(nv)}, {_sql_quote(sv)}, {iu}, {iv}, {_sql_quote(v)})"
        for (et, nu, su, nv, sv, iu, iv, v) in verdict_fixture()
    )
    return f"""
    WITH {_plants_cte()},
    present AS (SELECT DISTINCT idx FROM plants),
    vf(entity_type, name_u, start_date_u, name_v, start_date_v,
       idx_u, idx_v, verdict) AS (VALUES
        {rows}
    )
    SELECT entity_type, name_u, name_v, start_date_u, start_date_v, verdict
    FROM vf
    WHERE idx_u IN (SELECT idx FROM present)
      AND idx_v IN (SELECT idx FROM present)
    ORDER BY entity_type, name_u, start_date_u, name_v, start_date_v
    """


def entities_oracle_sql() -> str:
    """DuckDB SQL for ``kg_entities_planted``: (entity_id, entity_type,
    name, n_mentions, first_url), n_mentions net of the within-doc
    variant collapse (the loser surface's matches are absorbed as an
    alias WITHOUT its count — mentions.py:_collapse_variants keeps only
    the survivor's n_mentions)."""
    return f"""
    WITH {_plants_cte()},
    per_doc AS (
        SELECT doc_id, cluster, display, score_rank, COUNT(*) AS cnt
        FROM pm GROUP BY doc_id, cluster, display, score_rank
    ),
    kept AS (
        -- collapse survivor per (doc, collapsing cluster) = the
        -- best-score surface among those co-present in the doc; other
        -- cluster kinds keep every surface's count
        SELECT d.doc_id, d.cluster,
               CASE WHEN c.collapses = 1
                    AND d.score_rank > (
                        SELECT MIN(d2.score_rank) FROM per_doc d2
                        WHERE d2.doc_id = d.doc_id AND d2.cluster = d.cluster
                    )
                    THEN 0 ELSE d.cnt END AS cnt
        FROM per_doc d JOIN clus c ON c.cluster = d.cluster
    ),
    agg AS (
        SELECT cluster,
               SUM(cnt)::BIGINT AS n_mentions,
               'doc://' || lpad(CAST(MIN(doc_id) AS VARCHAR), 8, '0')
                   AS first_url
        FROM (
            SELECT k.doc_id, k.cluster, k.cnt FROM kept k
        ) GROUP BY cluster
    )
    SELECT c.eid AS entity_id, c.etype AS entity_type, c.canon AS name,
           a.n_mentions, a.first_url
    FROM agg a JOIN clus2 c USING (cluster)
    ORDER BY entity_id
    """


# ──────────────────────────────────────────────
# Planted hyperlink corpus (host-level web graph)
# ──────────────────────────────────────────────

_N_HOSTS = 101  # prime, so doc_id % _N_HOSTS spreads evenly


def linked_page_url(doc_id: int) -> str:
    """Absolute URL of a linked-corpus page (host = doc_id mod 101)."""
    return f"http://h{doc_id % _N_HOSTS}.example/p/{doc_id:08d}"


def link_targets(doc_id: int, n_docs: int) -> List[int]:
    """The md5-planted outlink targets of a doc: 1–3 links, each aimed
    at ``md5('link:doc:j') % n_docs``. Self-links and repeat targets
    are possible by construction — the host-graph op must count them
    faithfully (edge weight = raw anchor count)."""
    k = 1 + md5_lower64(f"nl:{doc_id}") % 3
    return [md5_lower64(f"link:{doc_id}:{j}") % n_docs for j in range(k)]


#: Anchor-text alias pool: the normalized display of every planted
#: surface (what an alias dictionary stores). Index md5-planted per
#: (doc, slot) — see ``anchor_alias_texts``.
_ALIAS_TEXTS: List[str] = [normalize_display(e.surface) for e in PLANTED]


def anchor_alias_texts(doc_id: int, n_links: int) -> List[str]:
    """The md5-planted anchor text for each of a doc's outlinks."""
    return [
        _ALIAS_TEXTS[md5_lower64(f"atext:{doc_id}:{j}") % len(_ALIAS_TEXTS)]
        for j in range(n_links)
    ]


def linked_pages_batch(batch: pa.Table, *, n_docs: int) -> pa.Table:
    """documents(doc_id) batch → (url, html) batch whose body carries
    the planted sentences plus a ``<nav>`` of md5-planted anchors. The
    anchors live OUTSIDE ``<article>`` so the text-extraction invariant
    of the planted corpus is untouched; anchor hrefs embed a
    ``&amp;``-escaped query parameter so the tokenizer's entity
    decoding is exercised on every page."""
    from html import escape

    doc_ids = batch.column("doc_id").to_pylist()
    urls, htmls = [], []
    for d in doc_ids:
        d = int(d)
        targets = link_targets(d, n_docs)
        texts = anchor_alias_texts(d, len(targets))
        anchors = "".join(
            f'<a href="{linked_page_url(t)}?src={d}&amp;slot={j}">'
            f"{escape(a)}</a>"
            for j, (t, a) in enumerate(zip(targets, texts))
        )
        urls.append(linked_page_url(d))
        htmls.append(
            f"<html><head><title>t{d}</title></head><body>"
            f"<article><p>{planted_text(d)}</p></article>"
            f"<nav>{anchors}</nav></body></html>".encode("utf-8")
        )
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "html": pa.array(htmls, type=pa.binary()),
        }
    )


def linked_pages_dataset(sf_dir: str):
    """Pruned documents read → deterministic linked-pages Dataset.

    ``n_docs`` comes from parquet metadata (``count()`` never scans
    data), and is closed over by the batch fn — NOT re-counted per
    batch."""
    from functools import partial

    from .reader import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id"]
    )
    n_docs = ds.count()
    return ds.map_batches(
        partial(linked_pages_batch, n_docs=n_docs), batch_format="pyarrow"
    )


def hostgraph_oracle_sql() -> str:
    """DuckDB SQL for ``kg_hostgraph_planted``: re-derive every page's
    outlink targets from the md5 plant plan (no HTML parsing — the SQL
    side is the independent ground truth; the Ray side must recover the
    same edges from the actual anchor bytes) and aggregate to the
    host-level graph."""
    return f"""
    WITH n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    k AS (
        SELECT doc_id,
               CAST(1 + (md5_number_lower('nl:' || doc_id) % 3) AS BIGINT)
                   AS n_links
        FROM documents
    ),
    links AS (
        SELECT k.doc_id,
               CAST(md5_number_lower('link:' || k.doc_id || ':' || u.j)
                    % (SELECT n_docs FROM n) AS BIGINT) AS dst
        FROM k, unnest(range(k.n_links)) AS u(j)
    )
    SELECT 'h' || CAST(doc_id % {_N_HOSTS} AS VARCHAR) || '.example'
               AS src_host,
           'h' || CAST(dst % {_N_HOSTS} AS VARCHAR) || '.example'
               AS dst_host,
           count(*)::BIGINT AS n_links
    FROM links
    GROUP BY src_host, dst_host
    ORDER BY src_host, dst_host
    """


def anchor_alias_oracle_sql() -> str:
    """DuckDB SQL for ``kg_anchor_alias_planted``: the alias dictionary
    (anchor_text → target host, weight) re-derived from the md5 plant
    plan plus the gazetteer VALUES fixture — no HTML parsing on the SQL
    side; the Ray side must recover every alias string from the actual
    anchor bytes (entity-escaped at generation, decoded by the
    tokenizer)."""
    return f"""
    WITH gaz(idx, display, cluster, score_rank) AS (VALUES
        {_gaz_values()}
    ),
    n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    k AS (
        SELECT doc_id,
               CAST(1 + (md5_number_lower('nl:' || doc_id) % 3) AS BIGINT)
                   AS n_links
        FROM documents
    ),
    l AS (
        SELECT k.doc_id, u.j,
               CAST(md5_number_lower('link:' || k.doc_id || ':' || u.j)
                    % (SELECT n_docs FROM n) AS BIGINT) AS dst,
               CAST(md5_number_lower('atext:' || k.doc_id || ':' || u.j)
                    % {len(PLANTED)} AS BIGINT) AS aidx
        FROM k, unnest(range(k.n_links)) AS u(j)
    )
    SELECT g.display AS alias,
           'h' || CAST(l.dst % {_N_HOSTS} AS VARCHAR) || '.example'
               AS dst_host,
           count(*)::BIGINT AS n_links
    FROM l JOIN gaz g ON g.idx = l.aidx
    GROUP BY alias, dst_host
    ORDER BY alias, dst_host
    """


# ──────────────────────────────────────────────
# Planted messy-URL corpus (crawl URL canonicalization)
# ──────────────────────────────────────────────


def _canon_slot(doc_id: int, n_docs: int) -> int:
    """The canonical target a messy page names: ~3 pages per target, so
    the dedup is non-vacuous at every scale."""
    return md5_lower64(f"uslot:{doc_id}") % max(1, n_docs // 3)


def messy_url(doc_id: int, n_docs: int) -> str:
    """An md5-planted *variant spelling* of the canonical URL — byte-
    different, resource-identical. Variant 0 is the canonical spelling
    itself; 1–5 are uppercase scheme+host, explicit default port,
    trailing slash, utm tracking params, and a fragment."""
    canon = linked_page_url(_canon_slot(doc_id, n_docs))
    v = md5_lower64(f"uv:{doc_id}") % 6
    if v == 1:
        scheme, rest = canon.split("://", 1)
        host, path = rest.split("/", 1)
        return f"{scheme.upper()}://{host.upper()}/{path}"
    if v == 2:
        return canon.replace(".example/", ".example:80/", 1)
    if v == 3:
        return canon + "/"
    if v == 4:
        return canon + "?utm_source=feed&utm_medium=rss"
    if v == 5:
        return canon + "#section-2"
    return canon


def messy_url_batch(batch: pa.Table, *, n_docs: int) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    return pa.table(
        {
            "doc_id": pa.array([int(d) for d in doc_ids], type=pa.int64()),
            "url": pa.array(
                [messy_url(int(d), n_docs) for d in doc_ids],
                type=pa.string(),
            ),
        }
    )


def messy_urls_dataset(sf_dir: str):
    """Pruned documents read → (doc_id, messy url) Dataset."""
    from functools import partial

    from .reader import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id"]
    )
    n_docs = ds.count()
    return ds.map_batches(
        partial(messy_url_batch, n_docs=n_docs), batch_format="pyarrow"
    )


def url_canonicalize_oracle_sql() -> str:
    """DuckDB SQL for ``pages_url_canonicalize``: the ground-truth
    canonical URL comes straight from the slot formula — the SQL side
    never sees the messy spellings, so every normalization rule the Ray
    side applies (case, port, slash, utm, fragment) is value-checked."""
    return f"""
    WITH n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    s AS (
        SELECT doc_id,
               CAST(md5_number_lower('uslot:' || doc_id)
                    % GREATEST((SELECT n_docs FROM n) // 3, 1) AS BIGINT)
                   AS t
        FROM documents
    )
    SELECT 'http://h' || CAST(t % {_N_HOSTS} AS VARCHAR)
               || '.example/p/' || lpad(CAST(t AS VARCHAR), 8, '0')
               AS canon_url,
           count(*)::BIGINT AS n_pages,
           min(doc_id)::BIGINT AS keeper_doc_id
    FROM s GROUP BY canon_url ORDER BY canon_url
    """
