"""Pairwise match verification + dispute routing (reference A4/A5/S9).

The reference runs an LLM "match checker" on candidate pairs
(/root/reference/src/engine/match_checker.py:113-322, with type-specific
rule prompts at :18-75 and a per-run LRU memo) and a second-stage
merge-dispute agent on gray-band pairs (|sim − threshold| ≤ 0.05 ∧
confidence < 0.7, src/engine/mergers.py:907-942, constants at
src/constants.py:29-33), whose DEFER outcomes append to a review-queue
JSONL (src/engine/merge_dispute_agent.py:211-219).

This engine's deterministic analog:

- ``PairVerifier`` — an actor-pool ``map_batches`` class: rule state and
  the memo LRU are built once per actor in ``__init__`` (exactly where
  the reference's client + LRU live); verdicts are MATCH / SKIP / DEFER.
  A real LLM checker replaces ``_decide`` only.
- Round 2: the verdict GATES the merge (reference semantics) —
  ``resolve.candidate_edges`` keeps only MATCH pairs as edges (DEFER per
  policy), so swapping the verifier class changes resolution topology.
  The deterministic ``_decide`` declares MATCH exactly when
  ``mentions_match`` (the oracle's predicate) does, so the default
  topology is unchanged from round 1 and P/R = 1.0 is preserved.
- DEFER = the gray band around the per-type cosine threshold where the
  deterministic signals disagree (cosine says maybe, the name heuristics
  say no, or vice versa) — the reference's dispute-agent input.
- ``write_review_queue`` appends DEFER rows as JSONL (S9).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DomainConfig
from ..functions.matching import cosine_names, mentions_match
from ..functions.names import is_low_quality_name, names_likely_same

MATCH = "MATCH"
SKIP = "SKIP"
DEFER = "DEFER"

_GRAY_BAND = 0.05  # reference: src/constants.py:29-33


class PairVerifier:
    """Actor-pool stage: candidate pair rows → verdict rows."""

    def __init__(self, cfg: Optional[DomainConfig] = None, memo_size: int = 8192):
        self.cfg = cfg or DomainConfig()
        # per-actor memo, the analog of the reference's per-run LRU
        # (match_checker.py:117-128, default 8192 entries)
        self._decide = lru_cache(maxsize=memo_size)(self._decide_uncached)

    def _decide_uncached(
        self,
        entity_type: str,
        name_a: str,
        name_b: str,
        start_date_a: str,
        start_date_b: str,
        aliases_a: str = "",
        aliases_b: str = "",
    ) -> str:
        from .resolve import split_aliases

        cfg = self.cfg
        # MATCH ⇔ the shared deterministic predicate (incl. alias bridge
        # and the low-quality guard) — the same decision the driver-side
        # oracle replays, so gating edges on the verdict preserves P/R
        if mentions_match(
            entity_type,
            name_a,
            name_b,
            start_date_a=start_date_a,
            start_date_b=start_date_b,
            aliases_a=split_aliases(aliases_a),
            aliases_b=split_aliases(aliases_b),
            cfg=cfg,
        ):
            return MATCH
        # low-quality names never reach the dispute agent
        # (mergers.py:834-847): generic/descriptive names only merge on
        # the exact path above
        if is_low_quality_name(name_a) or is_low_quality_name(name_b):
            return SKIP
        # gray band: cosine sits within ±0.05 of the threshold but the
        # name heuristics would not merge → the dispute-agent row
        cos = cosine_names(name_a, name_b, cfg.embedding_dim)
        if abs(cos - cfg.threshold(entity_type)) <= _GRAY_BAND:
            return DEFER
        return SKIP

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_alias = "aliases_u" in batch.schema.names
        alias_u = (
            batch["aliases_u"].to_pylist() if has_alias else [""] * batch.num_rows
        )
        alias_v = (
            batch["aliases_v"].to_pylist() if has_alias else [""] * batch.num_rows
        )
        verdicts = []
        for et, na, nb, sa, sb, aa, ab in zip(
            batch["entity_type"].to_pylist(),
            batch["name_u"].to_pylist(),
            batch["name_v"].to_pylist(),
            batch["start_date_u"].to_pylist(),
            batch["start_date_v"].to_pylist(),
            alias_u,
            alias_v,
        ):
            verdicts.append(self._decide(et, na, nb, sa, sb, aa or "", ab or ""))
        return batch.append_column(
            "verdict", pa.array(verdicts, type=pa.string())
        )


def candidate_pairs_with_meta(raw_entities_ds, cfg: Optional[DomainConfig] = None):
    """Blocking explode → deduped per-block pair rows WITH name + alias
    metadata (the verifier's input shape). Round 2: shares the exact
    pair generation (rep/tail skew guard) with the edge path —
    ``resolve.candidate_pairs``."""
    from .resolve import candidate_pairs

    return candidate_pairs(raw_entities_ds, cfg)


def verify_pairs(
    pairs_ds,
    cfg: Optional[DomainConfig] = None,
    *,
    concurrency=2,
    verifier_cls=None,
):
    """Run the verifier actor pool over candidate pairs.

    ``verifier_cls`` swaps the decision model (an LLM-backed checker in
    a real deployment; a forced-verdict stub in tests)."""
    return pairs_ds.map_batches(
        verifier_cls or PairVerifier,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )


from dataclasses import dataclass


@dataclass
class MergeStats:
    """Aggregate counts from one resolution run (reference G1–G3:
    src/engine/mergers.py:43-55 MergeStats + the per-run pipeline
    counters at src/process_and_extract.py:343-362)."""

    new: int = 0        # canonical entities created
    merged: int = 0     # MATCH verdicts (pairs merged)
    skipped: int = 0    # SKIP verdicts
    disputed: int = 0   # DEFER verdicts (routed to the dispute queue)
    errors: int = 0

    @property
    def total(self) -> int:
        return self.new + self.merged + self.skipped + self.disputed + self.errors

    def to_dict(self) -> dict:
        return {
            "new": self.new,
            "merged": self.merged,
            "skipped": self.skipped,
            "disputed": self.disputed,
            "errors": self.errors,
            "total": self.total,
        }


def compute_merge_stats(verdicts_ds, n_entities: int) -> MergeStats:
    """Fold the (vocabulary-scale) verdict Dataset into MergeStats."""
    from ray.data.aggregate import Count

    counts = {MATCH: 0, SKIP: 0, DEFER: 0}
    if verdicts_ds is not None:
        for row in (
            verdicts_ds.groupby("verdict")
            .aggregate(Count(alias_name="n"))
            .take_all()
        ):
            counts[row["verdict"]] = int(row["n"])
    return MergeStats(
        new=int(n_entities),
        merged=counts[MATCH],
        skipped=counts[SKIP],
        disputed=counts[DEFER],
    )


def write_review_queue(verdicts_ds, path: str) -> int:
    """DEFER rows → JSONL review queue (reference S9). Returns count."""
    import json

    import pyarrow.compute as _pc

    deferred = verdicts_ds.map_batches(
        lambda b: b.filter(_pc.equal(b["verdict"], DEFER)),
        batch_format="pyarrow",
    )
    n = 0
    # streamed: dispute volume is corpus-correlated under a real checker,
    # so the queue is drained block-by-block, never fully materialized
    with open(path, "a") as f:
        for batch in deferred.iter_batches(batch_size=4096, batch_format="pandas"):
            for r in batch.to_dict("records"):
                f.write(
                    json.dumps({k: r[k] for k in sorted(r)}, default=str) + "\n"
                )
            n += len(batch)
    return n
