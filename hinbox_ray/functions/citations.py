"""Citation parsing + grounding summary kernels (reference M15/G4).

Reimplements the reference's citation-anchored claim extraction
(/root/reference/src/utils/quality_controls.py:34,544-578) and the
grounding-report arithmetic (:718-748) as pure functions usable inside
``map_batches``: a profile text with ``^[article_id]`` markers yields
(article_id, claim) pairs — the claim is the span between the previous
citation's end and this citation's start, with adjacent citations
reusing the last non-empty claim — and a set of per-claim support
labels folds into verified/unverified/missing counts, a grounding
score, and the reference's flag set.

The LLM verifier the reference runs per claim (quality_controls.py:
602-716) is a pluggable stage here; the deterministic stand-in used by
``support_by_substring`` labels a claim SUPPORTED when its normalized
text occurs in the source article (enough to exercise the full report
path without a model).
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Tuple

# ^[article_id], article_id non-empty and whitespace-free
# (reference: quality_controls.py:34)
CITATION_RE = re.compile(r"\^\[([^\]\s]+)\]")

SUPPORTED = "supported"
PARTIAL = "partial"
NOT_SUPPORTED = "not_supported"
UNCLEAR = "unclear"
MISSING_SOURCE = "missing_source"


def extract_cited_claims(profile_text: str) -> List[Dict[str, str]]:
    """(article_id, citation, claim) triples per citation marker
    (reference semantics incl. the adjacent-citation claim reuse)."""
    claims: List[Dict[str, str]] = []
    last_end = 0
    last_claim = ""
    for match in CITATION_RE.finditer(profile_text):
        claim_text = profile_text[last_end : match.start()].strip()
        if not claim_text:
            claim_text = last_claim
        if claim_text:
            last_claim = claim_text
        claims.append(
            {
                "article_id": match.group(1),
                "citation": match.group(0),
                "claim": claim_text or "(no claim text)",
            }
        )
        last_end = match.end()
    return claims


def support_by_substring(claim: str, article_text: Optional[str]) -> str:
    """Deterministic verifier stand-in: SUPPORTED iff the normalized
    claim occurs in the article text; MISSING_SOURCE when the article
    is unknown."""
    if article_text is None:
        return MISSING_SOURCE
    norm = " ".join(claim.split()).lower()
    hay = " ".join(article_text.split()).lower()
    return SUPPORTED if norm and norm in hay else NOT_SUPPORTED


def grounding_summary(
    support_levels: Iterable[str], *, min_grounding_score: float = 0.5
) -> Dict[str, object]:
    """Verified/unverified/missing counts + score + flags
    (reference: quality_controls.py:718-748)."""
    levels = list(support_levels)
    verified = sum(1 for s in levels if s in (SUPPORTED, PARTIAL))
    unverified = sum(1 for s in levels if s in (NOT_SUPPORTED, UNCLEAR))
    missing = sum(1 for s in levels if s == MISSING_SOURCE)
    total = len(levels)
    score = (verified / total) if total else None
    flags: List[str] = []
    if missing:
        flags.append("missing_sources")
    if any(s == NOT_SUPPORTED for s in levels):
        flags.append("unsupported_claims")
    passed = True
    if score is not None and score < min_grounding_score:
        flags.append("low_grounding_score")
        passed = False
    return {
        "total_citations": total,
        "verified": verified,
        "unverified": unverified,
        "missing_source": missing,
        "grounding_score": score,
        "flags": flags,
        "passed": passed,
    }


def ground_profile(
    profile_text: str,
    articles: Dict[str, str],
    *,
    min_grounding_score: float = 0.5,
) -> Dict[str, object]:
    """End-to-end: parse citations → verify each claim against its
    article → summary report."""
    claims = extract_cited_claims(profile_text)
    levels = [
        support_by_substring(c["claim"], articles.get(c["article_id"]))
        for c in claims
    ]
    report = grounding_summary(levels, min_grounding_score=min_grounding_score)
    report["claims"] = claims
    return report
