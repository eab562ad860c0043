"""Extraction QC kernels: the mention-validation (anti-hallucination)
filter and the QC report counters.

Reimplements the reference's article-relevance filter
(/root/reference/src/utils/quality_controls.py:323-425): an extracted
entity survives only if some needle — canonical name, alias, computed
acronym, or equivalence-group variant — appears in the article text,
with word-boundary matching for needles ≤ 3 chars so "US" can't match
inside "thus". In this engine's deterministic world mentions come FROM
the text scan, so the filter passes by construction on the happy path;
it exists as the independent gate a real (LLM) extractor stage plugs in
front of, applied per batch inside ``map_batches``.

Also the QC report flags (quality_controls.py:83-91,283-305):
``high_drop_rate`` (> 50 % dropped), ``many_duplicates`` (> 50 %
deduped), ``many_low_quality_names`` (≥ 2).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

from .names import compute_acronym, is_low_quality_name


def _needles(
    entity: Dict[str, Any],
    entity_type: str,
    eq_lookup: Dict[str, List[str]],
) -> List[str]:
    name_field = "title" if entity_type == "events" else "name"
    raw = str(entity.get(name_field, "") or "")
    needles = [raw] if raw else []
    for alias in entity.get("aliases", []) or []:
        if alias:
            needles.append(alias)
    if entity_type in ("organizations", "locations") and raw:
        acro = compute_acronym(raw)
        if acro and len(acro) >= 2:
            needles.append(acro)
    if raw.lower() in eq_lookup:
        needles.extend(eq_lookup[raw.lower()])
    return needles


def _mentioned(needle: str, article_lower: str) -> bool:
    nl = needle.lower()
    if len(nl) <= 3:
        return re.search(r"\b" + re.escape(nl) + r"\b", article_lower) is not None
    return nl in article_lower


def filter_entities_by_mention(
    entities: List[Dict[str, Any]],
    article_text: str,
    *,
    entity_type: str,
    equivalence_groups: Sequence[Sequence[str]] = (),
    require_mention: bool = True,
) -> Tuple[List[Dict[str, Any]], Dict[str, Any]]:
    """(kept_entities, report) — reference-semantics relevance filter."""
    report: Dict[str, Any] = {
        "input_count": len(entities),
        "dropped": 0,
        "reasons": {},
    }
    if not require_mention or not entities or not article_text:
        report["output_count"] = len(entities)
        return entities, report

    eq_lookup: Dict[str, List[str]] = {}
    for group in equivalence_groups:
        for name in group:
            eq_lookup[name.lower()] = list(group)

    article_lower = article_text.lower()
    name_field = "title" if entity_type == "events" else "name"
    kept: List[Dict[str, Any]] = []
    for entity in entities:
        raw = str(entity.get(name_field, "") or "")
        if not raw:
            kept.append(entity)  # nothing to validate against
            continue
        if any(
            _mentioned(n, article_lower)
            for n in _needles(entity, entity_type, eq_lookup)
        ):
            kept.append(entity)
        else:
            report["dropped"] += 1
            report["reasons"]["no_mention"] = (
                report["reasons"].get("no_mention", 0) + 1
            )
    report["output_count"] = len(kept)
    return kept, report


def qc_flags(
    *,
    input_count: int,
    dropped: int,
    deduped: int,
    names: Sequence[str] = (),
) -> List[str]:
    """Per-document QC flags (reference thresholds)."""
    flags: List[str] = []
    if input_count and dropped / input_count > 0.5:
        flags.append("high_drop_rate")
    if input_count and deduped / input_count > 0.5:
        flags.append("many_duplicates")
    if sum(1 for n in names if is_low_quality_name(n)) >= 2:
        flags.append("many_low_quality_names")
    if input_count and not (input_count - dropped - deduped):
        flags.append("zero_entities")
    return flags
