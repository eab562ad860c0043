"""Deterministic name-variant kernels for entity canonicalization.

Semantics-compatible reimplementation of the reference's deterministic
name utilities (``/root/reference/src/utils/name_variants.py``) — the
normalizers, acronym logic, containment checks, equivalence-group
expansion, pairwise same-entity heuristic, low-quality detection and the
canonical-name scorer. These are pure scalar functions invoked inside
``map_batches`` / ``map_groups`` kernels; no shuffle, no state.

Reference anchors (file:line into /root/reference):
- normalize display/match: src/utils/name_variants.py:27-45
- acronym form/compute/match: :53-122
- containment: :130-150
- equivalence expansion: :197-215
- names_likely_same: :223-281
- low-quality names: :290-344
- canonical score: :363-393
- merge-time bonuses: src/engine/mergers.py:231-274
"""

from __future__ import annotations

import re
import unicodedata
from typing import Dict, FrozenSet, Iterable, List, Optional, Sequence, Set, Tuple

ACRONYM_STOPWORDS: FrozenSet[str] = frozenset(
    {"the", "of", "for", "and", "to", "in", "on", "a", "an", "at", "by"}
)

_MATCH_STRIP_RE = re.compile(r"[''\".,;:!?()\[\]{}&/\\–—-]")

_GENERIC_PLURAL_HEADS: FrozenSet[str] = frozenset(
    {
        "departments", "agencies", "officials", "authorities", "forces",
        "organizations", "institutions", "offices", "committees", "groups",
        "teams", "units", "branches", "divisions",
    }
)

_DESCRIPTIVE_LOCATION_RE = re.compile(
    r"(?i)^(?:(?:u\.s\.?|american|cuban|military)\s+)?"
    r"(?:military\s+)?(?:base|prison|facility|camp|detention\s+center|jail|compound|complex|site)"
    r"\s+(?:in|at|near|outside|on)\s+",
)

_CONTEXTUAL_SUFFIXES: FrozenSet[str] = frozenset(
    {"soil", "territory", "waters", "border", "grounds", "arena", "area"}
)


def normalize_display(name: str) -> str:
    """Strip, collapse whitespace runs, NFC-normalize (display form)."""
    text = str(name or "").strip()
    text = " ".join(text.split())
    return unicodedata.normalize("NFC", text)


def normalize_for_match(name: str) -> str:
    """Lowercase, strip punctuation, collapse whitespace (matching form)."""
    text = normalize_display(name).lower()
    text = _MATCH_STRIP_RE.sub(" ", text)
    return " ".join(text.split())


def is_acronym_form(name: str, *, min_len: int = 2, max_len: int = 10) -> bool:
    """True for acronym-shaped strings: "ICE", "U.N.", and short mixed forms "DoD"."""
    cleaned = name.replace(".", "").replace(" ", "").strip()
    if not cleaned or not (min_len <= len(cleaned) <= max_len):
        return False
    if cleaned.isalpha() and cleaned.isupper():
        return True
    if cleaned.isalpha() and len(cleaned) <= 4:
        return sum(1 for c in cleaned if c.isupper()) >= len(cleaned) / 2
    return False


def compute_acronym(
    long_name: str, *, stopwords: FrozenSet[str] = ACRONYM_STOPWORDS
) -> Optional[str]:
    """First letters of the significant words: "Department of Homeland Security" → "DHS"."""
    words = long_name.split()
    if len(words) < 2:
        return None
    significant = [w for w in words if w.lower() not in stopwords]
    if len(significant) < 2:
        return None
    acronym = "".join(w[0].upper() for w in significant if w)
    return acronym if len(acronym) >= 2 else None


def acronym_matches(short: str, long_name: str) -> bool:
    """True when `short` is exactly the acronym derived from `long_name`."""
    if not is_acronym_form(short):
        return False
    derived = compute_acronym(long_name)
    if derived is None:
        return False
    return short.replace(".", "").replace(" ", "").strip().upper() == derived


def is_name_contained(short_name: str, long_name: str, *, min_short_len: int = 4) -> bool:
    """Word-boundary containment of the shorter (match-normalized) name in the longer."""
    short_match = normalize_for_match(short_name)
    long_match = normalize_for_match(long_name)
    if len(short_match) < min_short_len:
        return False
    if short_match == long_match:
        return True
    return bool(re.search(r"\b" + re.escape(short_match) + r"\b", long_match))


def expand_equivalents(
    name: str, equivalence_groups: Sequence[Sequence[str]]
) -> Set[str]:
    """{name} ∪ all configured synonyms in any matching equivalence group."""
    result: Set[str] = {name}
    name_match = normalize_for_match(name)
    for group in equivalence_groups:
        if name_match in {normalize_for_match(g) for g in group}:
            result.update(group)
    return result


def names_likely_same(
    name_a: str,
    name_b: str,
    *,
    entity_type: str = "organizations",
    equivalence_groups: Sequence[Sequence[str]] = (),
) -> bool:
    """Deterministic same-entity heuristic (no model calls).

    1) exact match after normalization; 2) acronym ↔ long form;
    3) word-boundary containment; 4) equivalence-group membership.
    People are conservative: only (1) and (4).
    """
    match_a = normalize_for_match(name_a)
    match_b = normalize_for_match(name_b)
    if match_a == match_b:
        return True

    def in_same_group() -> bool:
        if not equivalence_groups:
            return False
        expanded = expand_equivalents(name_a, equivalence_groups)
        return match_b in {normalize_for_match(e) for e in expanded}

    if entity_type == "people":
        return in_same_group()

    disp_a = normalize_display(name_a)
    disp_b = normalize_display(name_b)
    a_is_acro = is_acronym_form(disp_a)
    b_is_acro = is_acronym_form(disp_b)
    if a_is_acro and not b_is_acro and acronym_matches(disp_a, disp_b):
        return True
    if b_is_acro and not a_is_acro and acronym_matches(disp_b, disp_a):
        return True

    if len(match_a) != len(match_b):
        short, long = (disp_a, disp_b) if len(match_a) < len(match_b) else (disp_b, disp_a)
        if is_name_contained(short, long):
            return True

    return in_same_group()


from functools import lru_cache


@lru_cache(maxsize=65536)
def is_low_quality_name(name: str) -> bool:
    """Generic plural head nouns and descriptive location phrases.

    Memoized: callers run it once per extracted entity instance
    (corpus-scale) but distinct names are vocabulary-scale and
    Zipf-distributed, so the cache hit rate is ~100%.
    """
    if not name or not name.strip():
        return False
    cleaned = name.strip()
    words = cleaned.split()
    if len(words) >= 2 and words[-1].lower() in _GENERIC_PLURAL_HEADS:
        return True
    return bool(_DESCRIPTIVE_LOCATION_RE.match(cleaned))


def score_canonical_name(name: str) -> float:
    """Higher = more canonical. Length bonus; acronym −2; contextual suffix −3; low-quality −4."""
    score = min(len(name) / 50.0, 1.0)
    if is_acronym_form(name):
        score -= 2.0
    words = name.lower().split()
    if words and words[-1] in _CONTEXTUAL_SUFFIXES:
        score -= 3.0
    if is_low_quality_name(name):
        score -= 4.0
    return score


def canonical_score_with_bonuses(name: str, others: Iterable[str]) -> float:
    """Merge-time canonical score of `name` within a cluster of `others`.

    Adds the reference's pairwise merge bonuses
    (src/engine/mergers.py:252-268), evaluated against any other cluster
    member: +1.0 when `name` contains some other member at a word
    boundary (more complete form), +2.0 when some other member is
    acronym-shaped and derives from `name` (full form beats acronym).
    Deterministic; used for per-component canonical election.
    """
    score = score_canonical_name(name)
    containment = 0.0
    acro_bonus = 0.0
    for other in others:
        if other == name:
            continue
        if containment == 0.0 and is_name_contained(other, name):
            containment = 1.0
        if acro_bonus == 0.0 and is_acronym_form(other):
            derived = compute_acronym(name)
            if derived and derived.upper() == other.replace(".", "").upper():
                acro_bonus = 2.0
    return score + containment + acro_bonus


# ──────────────────────────────────────────────
# Lexical similarity (blocking-stage scorer)
# ──────────────────────────────────────────────
#
# The reference uses RapidFuzz WRatio (cutoff 60) for lexical blocking
# (src/engine/mergers.py:366-373). RapidFuzz is not available here, so the
# engine uses a deterministic token-set/partial ratio built on stdlib
# difflib-free token logic. It plays the same role: a cheap 0-100 score
# gating which candidate pairs are worth the expensive checks.


def _bigrams(s: str) -> Set[str]:
    return {s[i : i + 2] for i in range(len(s) - 1)} if len(s) > 1 else {s}


def lexical_ratio(a: str, b: str) -> float:
    """Deterministic 0-100 lexical similarity of two match-normalized names.

    max(token-Jaccard, char-bigram-Dice, containment boost) scaled to
    0-100 — same gating role as the reference's WRatio.
    """
    na, nb = normalize_for_match(a), normalize_for_match(b)
    if not na or not nb:
        return 0.0
    if na == nb:
        return 100.0
    ta, tb = set(na.split()), set(nb.split())
    tok = len(ta & tb) / len(ta | tb) if (ta or tb) else 0.0
    ba, bb = _bigrams(na), _bigrams(nb)
    dice = 2 * len(ba & bb) / (len(ba) + len(bb))
    cont = 0.9 if (na in nb or nb in na) else 0.0
    return 100.0 * max(tok, dice, cont)


def entity_variant_texts(
    name: str,
    aliases: Sequence[str] = (),
    alternatives: Sequence[str] = (),
) -> List[str]:
    """Canonical name + aliases + alternatives + derived acronym, deduped.

    Mirrors the variant collection the reference uses to build its
    blocking index (src/engine/mergers.py:276-317).
    """
    texts = [name]
    texts.extend(a.strip() for a in aliases if isinstance(a, str) and a.strip())
    texts.extend(a.strip() for a in alternatives if isinstance(a, str) and a.strip())
    acro = compute_acronym(name)
    if acro:
        texts.append(acro)
    seen: Set[str] = set()
    unique: List[str] = []
    for t in texts:
        low = t.lower()
        if low not in seen:
            seen.add(low)
            unique.append(t)
    return unique


def equivalence_group_index(
    equivalence_groups: Sequence[Sequence[str]],
) -> Dict[str, int]:
    """match-normalized variant → group id, for O(1) group lookup in kernels."""
    index: Dict[str, int] = {}
    for gid, group in enumerate(equivalence_groups):
        for g in group:
            index[normalize_for_match(g)] = gid
    return index
