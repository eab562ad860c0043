"""Driver-side reference-semantics oracle: serial greedy merge.

Replays the CONTROL FLOW of the reference engine — one thread, article
submission order, mutable entity store, greedy merge into the first
matching existing entity, incremental canonical-key swap
(/root/reference/src/process_and_extract.py:747-760 →
src/engine/mergers.py:707-1258) — using the SAME deterministic kernels
as the Ray pipeline (MentionExtractor per-doc extraction + QC, the
shared ``mentions_match`` predicate, the canonical scorer). The result
is the triple set the reference would emit given the deterministic stub
model; the Ray pipeline's connected-components resolution is measured
against it (P/R ≥ 0.95, BASELINE.json north rule).

Driver-side and O(store) per entity by design — this is the *semantics
oracle* for small-scale correctness, never a production path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import pyarrow as pa

from ..config import DomainConfig
from ..functions.hashing import entity_id as make_entity_id
from ..functions.html_text import extract_article
from ..functions.matching import mentions_match
from ..functions.names import (
    canonical_score_with_bonuses,
    score_canonical_name,
)
from ..stages.mentions import MentionExtractor

_SWAP_MARGIN = 0.3


class _StoreEntity:
    __slots__ = (
        "entity_type", "name", "attr_type", "start_date", "end_date",
        "event_type", "description", "aliases", "urls", "n_mentions",
    )

    def __init__(self, ent: Dict, url: str):
        self.entity_type = ent["entity_type"]
        self.name = ent["name"]
        self.attr_type = ent["attr_type"]
        self.start_date = ent["start_date"]
        self.end_date = ent["end_date"]
        self.event_type = ent["event_type"]
        self.description = ent["description"]
        self.aliases: List[str] = list(ent["aliases"])
        self.urls: Set[str] = {url}
        self.n_mentions = int(ent["n_mentions"])


def _key(e: "_StoreEntity") -> Tuple:
    if e.entity_type == "people":
        return (e.entity_type, e.name)
    if e.entity_type in ("organizations", "locations"):
        return (e.entity_type, e.name, e.attr_type)
    return (e.entity_type, e.name, e.start_date)


def _merge_into(store_e: "_StoreEntity", ent: Dict, url: str) -> None:
    """Greedy merge + incremental canonical swap (mergers.py:962-1017,
    1144-1156): swap the canonical name only when the incoming one is
    better by more than the margin; absorb loser name + aliases."""
    existing_score = canonical_score_with_bonuses(
        store_e.name, [ent["name"], *ent["aliases"], *store_e.aliases]
    )
    incoming_score = canonical_score_with_bonuses(
        ent["name"], [store_e.name, *store_e.aliases, *ent["aliases"]]
    )

    def absorb(name: str):
        low = {a.lower() for a in store_e.aliases} | {store_e.name.lower()}
        if name and name.lower() not in low:
            store_e.aliases.append(name)

    if incoming_score > existing_score + _SWAP_MARGIN:
        demoted = store_e.name
        store_e.name = ent["name"]
        store_e.attr_type = ent["attr_type"] or store_e.attr_type
        if ent["start_date"]:
            store_e.start_date = ent["start_date"]
        absorb(demoted)
    else:
        absorb(ent["name"])
    for a in ent["aliases"]:
        absorb(a)
    store_e.end_date = store_e.end_date or ent["end_date"]
    store_e.event_type = store_e.event_type or ent["event_type"]
    store_e.description = store_e.description or ent["description"]
    store_e.urls.add(url)
    store_e.n_mentions += int(ent["n_mentions"])


def reference_resolve(
    pages: pa.Table, cfg: Optional[DomainConfig] = None
) -> List["_StoreEntity"]:
    """Serial greedy resolution over pages in url order."""
    cfg = cfg or DomainConfig()
    extractor = MentionExtractor(cfg)

    rows = sorted(
        zip(
            pages.column("url").to_pylist(),
            pages.column("html").to_pylist(),
            pages.column("lang").to_pylist(),
        ),
        key=lambda r: r[0],
    )

    store: List[_StoreEntity] = []  # insertion order = first-seen order
    by_key: Dict[Tuple, _StoreEntity] = {}

    for url, html, lang in rows:
        if lang != "en":
            continue
        if isinstance(html, bytes):
            html = html.decode("utf-8", errors="replace")
        _, text = extract_article(html or "")
        if not text:
            continue
        for ent in extractor._extract_doc(text):
            cand = _StoreEntity(ent, url)
            k = _key(cand)
            if k in by_key:  # exact-key fast path (mergers.py:452-473)
                _merge_into(by_key[k], ent, url)
                continue
            # greedy scan in first-seen order: merge into the FIRST
            # existing entity the shared predicate accepts
            target = None
            for e in store:
                if e.entity_type != ent["entity_type"]:
                    continue
                if mentions_match(
                    e.entity_type,
                    ent["name"],
                    e.name,
                    start_date_a=ent["start_date"],
                    start_date_b=e.start_date,
                    aliases_a=ent["aliases"],
                    aliases_b=e.aliases,
                    cfg=cfg,
                ):
                    target = e
                    break
            if target is not None:
                old_key = _key(target)
                _merge_into(target, ent, url)
                new_key = _key(target)
                if new_key != old_key:  # re-key on canonical swap
                    by_key.pop(old_key, None)
                    by_key[new_key] = target
            else:
                store.append(cand)
                by_key[k] = cand
    return store


def reference_triples(
    pages: pa.Table, cfg: Optional[DomainConfig] = None
) -> pa.Table:
    """Sorted (subj, pred, obj) table of the oracle's entity store
    (triple view per SURVEY.md §7.0)."""
    store = reference_resolve(pages, cfg)
    triples: Set[Tuple[str, str, str]] = set()
    for e in store:
        if e.entity_type == "people":
            key = e.name
        elif e.entity_type in ("organizations", "locations"):
            key = f"{e.name}\x1f{e.attr_type}"
        else:
            key = f"{e.name}\x1f{e.start_date}"
        eid = make_entity_id(e.entity_type, key)
        triples.add((eid, "rdf:type", e.entity_type))
        triples.add((eid, "name", e.name))
        for a in e.aliases:
            triples.add((eid, "alias", a))
        if e.entity_type in ("organizations", "locations"):
            if e.attr_type:
                triples.add((eid, "type", e.attr_type))
        elif e.entity_type == "events":
            if e.event_type:
                triples.add((eid, "event_type", e.event_type))
            if e.start_date:
                triples.add((eid, "start_date", e.start_date))
            if e.end_date:
                triples.add((eid, "end_date", e.end_date))
        for u in e.urls:
            triples.add((eid, "mentioned_in", u))
    rows = sorted(triples)
    return pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
        }
    )


def precision_recall(
    engine: pa.Table, oracle: pa.Table
) -> Dict[str, float]:
    """Set precision/recall/F1 of engine triples vs oracle triples."""
    def to_set(t: pa.Table) -> Set[Tuple[str, str, str]]:
        return set(
            zip(
                t.column("subj").to_pylist(),
                t.column("pred").to_pylist(),
                t.column("obj").to_pylist(),
            )
        )

    es, os_ = to_set(engine), to_set(oracle)
    tp = len(es & os_)
    precision = tp / len(es) if es else 1.0
    recall = tp / len(os_) if os_ else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "engine_triples": len(es),
        "oracle_triples": len(os_),
        "agree": tp,
    }
