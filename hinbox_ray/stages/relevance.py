"""Domain-relevance gate ahead of extraction (reference F3).

The reference scores every article against the configured domain topics
before extraction (/root/reference/src/engine/relevance.py:12-61) via
``ArticleProcessor.check_relevance``
(/root/reference/src/engine/article_processor.py:70-128), which is
deliberately tolerant of the scorer's result shape: a bool, an object
with ``.is_relevant``, a dict with ``"is_relevant"``, or anything else
(→ relevant, reason "uncertain_result_shape").

Ray-native analog: ``RelevanceScorer`` is an actor-pool ``map_batches``
class — the compiled domain lexicon (or, in a real deployment, the LLM
client) is built once per actor in ``__init__``. The default
deterministic scorer marks a doc relevant iff any gazetteer surface
occurs in its text, using the SAME compiled alternation as the
extractor: a dropped doc provably contributes zero mentions, so the
gate prunes extractor work without changing the graph. A pluggable
``scorer_fn`` (any result shape above) replaces the rule.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc

from ..config import GAZETTEER, DomainConfig


def normalize_relevance_result(result: Any) -> Tuple[bool, str]:
    """(is_relevant, reason) from any scorer result shape — the
    reference's tolerant normalization (article_processor.py:96-108)."""
    if isinstance(result, bool):
        return result, ""
    if hasattr(result, "is_relevant"):
        return bool(result.is_relevant), str(getattr(result, "reason", ""))
    if isinstance(result, dict) and "is_relevant" in result:
        return bool(result.get("is_relevant")), str(result.get("reason", ""))
    return True, "uncertain_result_shape"


class RelevanceScorer:
    """Actor-pool stage: docs → docs + (is_relevant, relevance_reason).

    State (compiled lexicon / scorer) lives in ``__init__`` — once per
    actor, the analog of the reference's per-processor model client.
    """

    def __init__(
        self,
        cfg: Optional[DomainConfig] = None,
        scorer_fn: Optional[Callable[[str], Any]] = None,
    ):
        self.cfg = cfg or DomainConfig()
        self.scorer_fn = scorer_fn
        if scorer_fn is None:
            surfaces = sorted({e.surface for e in GAZETTEER}, key=len, reverse=True)
            alternation = "|".join(re.escape(s) for s in surfaces)
            self._rx = re.compile(rf"(?<!\w)(?:{alternation})(?!\w)")

    def _score(self, text: str) -> Tuple[bool, str]:
        if self.scorer_fn is not None:
            return normalize_relevance_result(self.scorer_fn(text))
        return (self._rx.search(text) is not None), ""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rel, reasons = [], []
        for text in batch["text"].to_pylist():
            ok, reason = self._score(text or "")
            rel.append(ok)
            reasons.append(reason)
        return batch.append_column(
            "is_relevant", pa.array(rel, type=pa.bool_())
        ).append_column("relevance_reason", pa.array(reasons, type=pa.string()))


def relevance_gate(
    docs_ds,
    cfg: Optional[DomainConfig] = None,
    *,
    scorer_fn: Optional[Callable[[str], Any]] = None,
    concurrency: Optional[int] = None,
    batch_size: int = 256,
):
    """Score + filter: only relevant docs continue to extraction.

    Returns the filtered Dataset (score columns stripped, so downstream
    schemas are unchanged). Irrelevant-count accounting happens where a
    counter sink exists (the lineage manifest path counts docs before /
    after the gate).
    """
    if concurrency is None:
        import ray

        n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = max(2, n // 2)

    scored = docs_ds.map_batches(
        RelevanceScorer,
        fn_constructor_kwargs={"cfg": cfg, "scorer_fn": scorer_fn},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

    def keep(batch: pa.Table) -> pa.Table:
        kept = batch.filter(batch["is_relevant"])
        return kept.drop_columns(["is_relevant", "relevance_reason"])

    return scored.map_batches(keep, batch_format="pyarrow")
