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
- DEFER = the gray band around the per-type cosine threshold where the
  deterministic signals disagree (cosine says maybe, the name heuristics
  say no, or vice versa). In the deterministic world the resolution
  edges are decided by ``mentions_match`` alone (the oracle's
  semantics), so the dispute queue is a side output for review — in an
  LLM deployment its verdicts would gate the merge, as in the reference.
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
    ) -> str:
        cfg = self.cfg
        cos = cosine_names(name_a, name_b, cfg.embedding_dim)
        thr = cfg.threshold(entity_type)
        heur = mentions_match(
            entity_type,
            name_a,
            name_b,
            start_date_a=start_date_a,
            start_date_b=start_date_b,
            cfg=cfg,
        )
        # low-quality names never auto-merge (mergers.py:834-847)
        if is_low_quality_name(name_a) or is_low_quality_name(name_b):
            return SKIP
        if heur:
            return MATCH
        # gray band: cosine sits within ±0.05 of the threshold but the
        # name heuristics would not merge → a human/LLM tie-breaker row
        if abs(cos - thr) <= _GRAY_BAND:
            return DEFER
        return SKIP

    def __call__(self, batch: pa.Table) -> pa.Table:
        verdicts = []
        for et, na, nb, sa, sb in zip(
            batch["entity_type"].to_pylist(),
            batch["name_u"].to_pylist(),
            batch["name_v"].to_pylist(),
            batch["start_date_u"].to_pylist(),
            batch["start_date_v"].to_pylist(),
        ):
            verdicts.append(self._decide(et, na, nb, sa, sb))
        return batch.append_column(
            "verdict", pa.array(verdicts, type=pa.string())
        )


def candidate_pairs_with_meta(raw_entities_ds, cfg: Optional[DomainConfig] = None):
    """Blocking explode → per-block pair rows WITH name metadata (the
    input shape the verifier consumes). Same blocking as
    resolve.candidate_edges, but emitting every considered pair rather
    than only accepted edges."""
    from .resolve import _explode_blocking

    cfg = cfg or DomainConfig()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("node_id").sort_values("node_id")
        rows = list(g.itertuples(index=False))
        cap = max(2, cfg.blocking.max_candidates)
        rows = rows[:cap]
        out = {
            "u": [], "v": [], "entity_type": [],
            "name_u": [], "name_v": [],
            "start_date_u": [], "start_date_v": [],
        }
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                out["u"].append(int(a.node_id))
                out["v"].append(int(b.node_id))
                out["entity_type"].append(a.entity_type)
                out["name_u"].append(a.name)
                out["name_v"].append(b.name)
                out["start_date_u"].append(a.start_date)
                out["start_date_v"].append(b.start_date)
        df = pd.DataFrame(out)
        df["u"] = df["u"].astype(np.int64) if len(df) else pd.Series(dtype=np.int64)
        df["v"] = df["v"].astype(np.int64) if len(df) else pd.Series(dtype=np.int64)
        return df

    exploded = raw_entities_ds.map_batches(
        lambda df: _explode_blocking(df, cfg), batch_format="pandas"
    )
    cand = exploded.groupby("block_key").map_groups(pairs, batch_format="pandas")
    # a pair can surface from several blocks
    return cand.groupby(["u", "v"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def verify_pairs(pairs_ds, cfg: Optional[DomainConfig] = None, *, concurrency=2):
    """Run the verifier actor pool over candidate pairs."""
    return pairs_ds.map_batches(
        PairVerifier,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )


def write_review_queue(verdicts_ds, path: str) -> int:
    """DEFER rows → JSONL review queue (reference S9). Returns count."""
    import json

    deferred = verdicts_ds.filter(lambda r: r["verdict"] == DEFER)
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
