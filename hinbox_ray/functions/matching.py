"""The deterministic entity-match predicate and blocking-key builder.

This is the engine's stand-in for the reference's merge decision stack —
lexical blocking (src/engine/mergers.py:319-415), cosine gate
(:417-521), LLM match-check (src/engine/match_checker.py) and
low-quality guard (:834-847) — collapsed into one pure, symmetric
predicate shared verbatim by BOTH the Ray pipeline and the driver-side
oracle, so the only difference the P/R harness measures is resolution
*topology* (connected components vs the reference's serial greedy
merge), not decision drift.

Decision rules (per entity type):

- people       : exact normalized name, equivalence group, or char-ngram
                 cosine ≥ threshold (conservative — containment/acronym
                 are never applied to people, matching
                 name_variants.names_likely_same:249-257).
- orgs / locs  : names_likely_same (exact / acronym / containment /
                 equivalence group) or cosine ≥ threshold.
- events       : title match per names_likely_same AND compatible
                 start_date (equal, or one side empty). The reference
                 delegates the date sanity check to its match-check LLM;
                 deterministically, same-title-different-date must stay
                 distinct (FIXTURES.md §2).
- low-quality guard: if either side has a generic/descriptive name, only
  an exact normalized match can merge them (reference guards the
  existing-candidate side at mergers.py:834-847; symmetric here because
  components have no "existing" side).
- alias bridge : any exact normalized-name intersection between the two
  variant sets (name + aliases) is a match — the CC analog of the
  reference re-keying merged aliases into its blocking index.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from ..config import DomainConfig
from .hashing import ngram_embedding
from .names import (
    ACRONYM_STOPWORDS,
    compute_acronym,
    is_acronym_form,
    is_low_quality_name,
    lexical_ratio,
    names_likely_same,
    normalize_for_match,
)
from .minhash import MinHasher, char_shingles


def name_embedding(name: str, dim: int = 64) -> np.ndarray:
    """Deterministic name embedding: hashed char-3-grams of the
    match-normalized name, L2-normalized float32."""
    return ngram_embedding(normalize_for_match(name), dim=dim, n=3)


def cosine_names(a: str, b: str, dim: int = 64) -> float:
    va, vb = name_embedding(a, dim), name_embedding(b, dim)
    return float(np.dot(va, vb))


def dates_compatible(a: str, b: str) -> bool:
    return (not a) or (not b) or a == b


def embeddings_compatible(
    dim_a: int, model_a: str, dim_b: int, model_b: str
) -> bool:
    """Embedding-compat predicate (reference mergers.py:164-212):
    vectors are comparable iff dims match and, when both models are
    known, the models match. Kept as an explicit column predicate so a
    mixed-model corpus (e.g. after an embedding upgrade) degrades to
    the lexical path instead of comparing incompatible vectors."""
    if dim_a != dim_b:
        return False
    if model_a and model_b and model_a != model_b:
        return False
    return True


def mentions_match(
    entity_type: str,
    name_a: str,
    name_b: str,
    *,
    start_date_a: str = "",
    start_date_b: str = "",
    aliases_a: Sequence[str] = (),
    aliases_b: Sequence[str] = (),
    cfg: Optional[DomainConfig] = None,
) -> bool:
    """Symmetric deterministic match decision (see module docstring)."""
    cfg = cfg or DomainConfig()
    na, nb = normalize_for_match(name_a), normalize_for_match(name_b)

    if entity_type == "events" and not dates_compatible(start_date_a, start_date_b):
        return False

    if na == nb:
        return True

    # alias bridge: exact intersection of variant sets
    variants_a = {na} | {normalize_for_match(x) for x in aliases_a if x}
    variants_b = {nb} | {normalize_for_match(x) for x in aliases_b if x}
    if variants_a & variants_b:
        return True

    # low-quality guard (symmetric): generic names only merge on exact match
    if is_low_quality_name(name_a) or is_low_quality_name(name_b):
        return False

    groups = cfg.groups_for(entity_type)
    if names_likely_same(
        name_a, name_b, entity_type=entity_type, equivalence_groups=groups
    ):
        return True

    # cosine gate over deterministic name embeddings — catches
    # transliteration-style variants the heuristics miss. Gated by the
    # lexical cutoff like the reference's blocking → cosine ladder.
    if lexical_ratio(name_a, name_b) >= cfg.blocking.lexical_cutoff:
        if cosine_names(name_a, name_b, cfg.embedding_dim) >= cfg.threshold(entity_type):
            return True

    return False


# ──────────────────────────────────────────────
# Blocking keys (the groupby shuffle keys)
# ──────────────────────────────────────────────

_NAME_HASHER = MinHasher(num_perm=32, seed=101)


def blocking_keys(
    entity_type: str,
    name: str,
    aliases: Sequence[str] = (),
    *,
    cfg: Optional[DomainConfig] = None,
    group_index: Optional[Dict[str, int]] = None,
) -> List[str]:
    """All blocking keys for one entity. Two entities can only become a
    candidate pair if they share ≥1 key — this is the SHUFFLE key set:

    - ``x:`` exact match-normalized name (every variant)
    - ``a:`` acronym bucket: derived acronym of long forms AND the
      cleaned form of acronym-shaped names, so "ICE" and
      "Immigration and Customs Enforcement" land in the same bucket
    - ``g:`` equivalence-group id from domain config
    - ``b:`` MinHash-LSH band buckets over char-3-shingles of the
      match-normalized name (catches transliteration variants; the
      north rule's MinHash-LSH blocking)
    - ``c:`` containment spans (orgs/locs): every contiguous token
      sub-span (length ≥ 2, not all stopwords) of the normalized name,
      plus the full name of ≥2-token entities — so whole-name
      containment pairs ("Homeland Security" ⊂ "Department of Homeland
      Security"), which the shared ``mentions_match`` predicate accepts
      via ``is_name_contained``, are always PROPOSED. The reference's
      serial greedy scan reaches every store entity, so its effective
      blocking recall for containment is 1 (mergers.py:366-373 WRatio
      scores such pairs ≥60); without this key the pair only surfaces
      when both forms co-occur in one document (alias bridge) and the
      distributed graph under-merges. Single-token shorts ("Pentagon")
      stay on the g:/a: keys — a per-token span would create
      corpus-hot blocks ("department") that the pair cap then drops.

    Keys are namespaced by entity type; events block on title only
    (reference: _lexical_text, mergers.py:214-222).
    """
    cfg = cfg or DomainConfig()
    prefix = entity_type[:3]
    keys: Set[str] = set()

    variants = [name] + [a for a in aliases if a]
    for v in variants:
        norm = normalize_for_match(v)
        if not norm:
            continue
        keys.add(f"{prefix}|x:{norm}")
        if entity_type != "people":
            acro = compute_acronym(v)
            if acro:
                keys.add(f"{prefix}|a:{acro}")
            if is_acronym_form(v):
                cleaned = v.replace(".", "").replace(" ", "").upper()
                keys.add(f"{prefix}|a:{cleaned}")
        if group_index is not None and norm in group_index:
            keys.add(f"{prefix}|g:{group_index[norm]}")
        if entity_type in ("organizations", "locations"):
            toks = norm.split()
            if len(toks) >= 2:
                keys.add(f"{prefix}|c:{norm}")
            for span_len in range(2, len(toks)):
                for i in range(len(toks) - span_len + 1):
                    span = toks[i : i + span_len]
                    if all(t in ACRONYM_STOPWORDS for t in span):
                        continue
                    keys.add(f"{prefix}|c:{' '.join(span)}")

    # LSH bands over the primary name only (aliases already bridge via x:)
    norm = normalize_for_match(name)
    if norm:
        sig = _NAME_HASHER.signature(char_shingles(norm, cfg.blocking.name_shingle_k))
        for bk in _NAME_HASHER.band_keys(sig, cfg.blocking.name_minhash_bands):
            keys.add(f"{prefix}|b:{bk}")

    return sorted(keys)
