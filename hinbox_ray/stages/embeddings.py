"""Embedding manager (A8) — LRU cache, batch hit/miss split, hybrid
fallback — and its Ray actor-pool stage.

Reimplements the CONTROL FLOW of the reference's unified embedding
manager (/root/reference/src/utils/embeddings/manager.py:41-441):

- mode resolution: explicit param > ``EMBEDDING_MODE`` env > default,
  with AUTO resolving to local when a local backend exists (:89-133);
- an LRU cache keyed by (provider fingerprint, sha256(text))
  (:57-62, 181-196; cache_utils.LRUCache) with hit/miss stats;
- ``embed_batch``: per-text cache lookup → embed ONLY the misses →
  store misses under the provider fingerprint (:226-273);
- HYBRID: primary provider failure falls back to the secondary
  (:254-262);
- fingerprint = model name + dimension, populated from the first
  result (:319-339).

Providers are injectable callables (no SDK/network in this container);
the default is the deterministic hashed-n-gram embedder
(functions/hashing.ngram_embedding), so the stage is exercisable
end-to-end. ``EmbedTextStage`` is the Ray-side consumer: one manager
per actor (built in ``__init__``, the A1 pattern), vectors emitted as a
``list<float>`` column. The per-actor LRU is what makes duplicate-heavy
web corpora cheap: repeated content embeds once per actor.
"""

from __future__ import annotations

import hashlib
import os
import threading
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa


class LRUCache:
    """Thread-safe LRU with hit/miss stats (reference cache_utils.py)."""

    def __init__(self, max_items: int):
        self._max = max(1, int(max_items))
        self._data: OrderedDict = OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def get(self, key):
        with self._lock:
            if key in self._data:
                self._data.move_to_end(key)
                self.hits += 1
                return self._data[key]
            self.misses += 1
            return None

    def set(self, key, value) -> None:
        with self._lock:
            if key in self._data:
                self._data.move_to_end(key)
            self._data[key] = value
            if len(self._data) > self._max:
                self._data.popitem(last=False)

    def __len__(self) -> int:
        return len(self._data)

    @property
    def stats(self) -> Dict[str, int]:
        return {"hits": self.hits, "misses": self.misses, "size": len(self._data)}


@dataclass
class EmbeddingResult:
    """Batch result with the metadata the fingerprint needs (reference
    base.py EmbeddingResult)."""

    embeddings: List[List[float]]
    model: str
    dimension: Optional[int] = None
    metadata: Dict[str, Any] = field(default_factory=dict)


def deterministic_provider(dim: int = 64, model: str = "ngram-hash-v1"):
    """The sandbox's 'model': hashed char-n-gram embeddings (pure
    function of the text — same vectors in every process)."""
    from ..functions.hashing import ngram_embedding

    def embed(texts: Sequence[str]) -> EmbeddingResult:
        return EmbeddingResult(
            embeddings=[
                [float(x) for x in ngram_embedding(t, dim=dim)] for t in texts
            ],
            model=model,
            dimension=dim,
        )

    return embed


def md5_count_provider(dim: int = 64, model: str = "ngram-md5-counts-v1"):
    """Oracle-expressible provider: md5-hashed char-3-gram signed counts
    (functions/hashing.md5_ngram_embedding). Used by the doc_embed
    toolbox op so its output carries exact integer invariants the DuckDB
    oracle recomputes."""
    from ..functions.hashing import md5_ngram_embedding

    def embed(texts: Sequence[str]) -> EmbeddingResult:
        return EmbeddingResult(
            embeddings=[
                [float(x) for x in md5_ngram_embedding(t, dim=dim)]
                for t in texts
            ],
            model=model,
            dimension=dim,
        )

    return embed


def build_md5_count_manager(dim: int = 64) -> "EmbeddingManager":
    """Module-level manager factory (picklable into actor constructors)."""
    p = md5_count_provider(dim=dim)
    return EmbeddingManager(cloud=p, local=p)


def make_fingerprint(model: Optional[str], dim: Optional[int]) -> Optional[str]:
    """model+dim fingerprint (reference manager.py:334-339): vectors
    cached under one fingerprint are never served for another model."""
    if not model:
        return None
    return f"{model}:{dim if dim is not None else '?'}"


def fingerprint_from_result(result: EmbeddingResult) -> Optional[str]:
    dim = result.dimension
    if dim is None and result.embeddings:
        dim = len(result.embeddings[0])
    return make_fingerprint(result.model, dim)


_MODES = ("auto", "local", "cloud", "hybrid")


class EmbeddingManager:
    """Provider-agnostic manager: mode resolution, LRU, hit/miss batch
    split, hybrid fallback (reference manager.py:41-441).

    ``cloud`` / ``local`` are embed callables ``texts ->
    EmbeddingResult``; HYBRID uses cloud first and falls back to local
    on failure. AUTO resolves to local iff a local provider was given
    (the reference probes for sentence-transformers, :32-38).
    """

    def __init__(
        self,
        mode: Optional[str] = None,
        *,
        cloud: Optional[Callable[[Sequence[str]], EmbeddingResult]] = None,
        local: Optional[Callable[[Sequence[str]], EmbeddingResult]] = None,
        lru_max_items: int = 4096,
        cache_enabled: bool = True,
        default_mode: str = "cloud",
    ):
        self.mode = self._resolve_mode(mode, default_mode, local is not None)
        self.cloud = cloud
        self.local = local
        self._cache_enabled = cache_enabled and lru_max_items > 0
        self._lru = LRUCache(lru_max_items)
        # Fingerprint of the provider that served the LAST batch — used
        # only to pick the lookup namespace for the next batch. Stores
        # always use the fingerprint recomputed from the batch that
        # actually produced the vectors (reference manager.py:198-203,
        # 265 recomputes per call), so a hybrid fallback mid-run can
        # never cache model-B vectors under model-A's fingerprint.
        self._fingerprint: Optional[str] = None

    @staticmethod
    def _resolve_mode(mode: Optional[str], default: str, has_local: bool) -> str:
        # param > env > default (reference :89-113); invalid env falls
        # through to the default rather than erroring
        requested = None
        if mode is not None:
            requested = str(mode).lower()
            if requested not in _MODES:
                raise ValueError(f"invalid embedding mode {mode!r}")
        else:
            env = os.getenv("EMBEDDING_MODE", "").lower()
            requested = env if env in _MODES else str(default).lower()
        if requested == "auto":  # reference :114-133
            return "local" if has_local else "cloud"
        return requested

    # -- cache plumbing (reference :181-196) --

    @staticmethod
    def _key(fp: Optional[str], text: str) -> Optional[Tuple[str, str]]:
        if not fp:
            return None
        return (fp, hashlib.sha256(text.encode("utf-8")).hexdigest())

    def _lookup(self, fp: Optional[str], text: str):
        if not self._cache_enabled:
            return None
        key = self._key(fp, text)
        return self._lru.get(key) if key else None

    def _store(self, fp: Optional[str], text: str, vec: List[float]) -> None:
        if not self._cache_enabled:
            return
        key = self._key(fp, text)
        if key:
            self._lru.set(key, vec)

    # -- providers --

    def _primary(self):
        if self.mode in ("cloud", "hybrid"):
            if self.cloud is None:
                raise ValueError("cloud provider not initialized")
            return self.cloud
        if self.local is None:
            raise ValueError("local provider not initialized")
        return self.local

    def _embed_misses(self, texts: List[str]) -> EmbeddingResult:
        provider = self._primary()
        try:
            return provider(texts)
        except Exception:
            if self.mode == "hybrid" and self.local is not None:
                return self.local(texts)  # reference :254-262
            raise

    # -- public API --

    def embed_batch(
        self, texts: Sequence[str], use_cache: bool = True
    ) -> List[List[float]]:
        """Per-text cache lookup → embed only the misses → store
        (reference :226-273)."""
        texts = list(texts)
        if not texts:
            return []
        results: List[Optional[List[float]]] = [None] * len(texts)
        miss_idx: List[int] = []
        lookup_fp = self._fingerprint  # last-served model's namespace
        if use_cache and self._cache_enabled:
            for i, t in enumerate(texts):
                hit = self._lookup(lookup_fp, t)
                if hit is not None:
                    results[i] = hit
                else:
                    miss_idx.append(i)
        else:
            miss_idx = list(range(len(texts)))
        if miss_idx:
            # within-batch dedup: duplicate-heavy web batches embed each
            # distinct text once (the reference embeds the raw miss list;
            # this strictly reduces provider work, same outputs)
            uniq: List[str] = []
            pos: Dict[str, int] = {}
            for i in miss_idx:
                t = texts[i]
                if t not in pos:
                    pos[t] = len(uniq)
                    uniq.append(t)
            batch = self._embed_misses(uniq)
            # ADVICE r3 (medium): recompute the fingerprint from THIS
            # batch's result — the provider that actually served it —
            # and store under it; a write-once fingerprint poisons the
            # cache across a hybrid fallback (model-B vectors filed and
            # later served under model-A's key).
            batch_fp = fingerprint_from_result(batch)
            self._fingerprint = batch_fp
            for i in miss_idx:
                vec = batch.embeddings[pos[texts[i]]]
                results[i] = vec
                if use_cache:
                    self._store(batch_fp, texts[i], vec)
        return [r for r in results if r is not None]

    def embed_text(self, text: str, use_cache: bool = True) -> List[float]:
        return self.embed_batch([text], use_cache=use_cache)[0]

    def cache_stats(self) -> Dict[str, int]:
        return self._lru.stats


class EmbedTextStage:
    """Actor-pool stage: text column → ``embedding`` list<float> column.

    One EmbeddingManager per actor (``__init__``), so the LRU and the
    provider live for the actor's whole life — exactly the reference's
    long-lived manager, sharded across the pool. Use::

        ds.map_batches(EmbedTextStage, fn_constructor_kwargs={...},
                       batch_format="pyarrow", concurrency=N)

    ``dim`` must match the manager's output dimension (also when a
    custom ``manager_factory`` is given): it pins the Arrow type of
    empty blocks to the same fixed_size_list<float32, dim> as data
    blocks, keeping schemas unifiable across the pipeline.
    """

    def __init__(
        self,
        text_col: str = "text",
        dim: int = 64,
        mode: Optional[str] = None,
        manager_factory: Optional[Callable[[], EmbeddingManager]] = None,
    ):
        self.text_col = text_col
        self.dim = int(dim)
        if manager_factory is not None:
            self.manager = manager_factory()
        else:
            provider = deterministic_provider(dim=dim)
            self.manager = EmbeddingManager(
                mode=mode, cloud=provider, local=provider
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # parquet written by pandas carries a schema-level 'pandas'
        # metadata dict that makes pa.Schema unhashable — Ray's block
        # schema dedup then warns on every block ("Failed to hash the
        # schemas"). Metadata-only strip, zero-copy.
        batch = batch.replace_schema_metadata(None)
        texts = batch[self.text_col].to_pylist()
        vecs = self.manager.embed_batch(texts)
        arr = np.asarray(vecs, dtype=np.float32)
        if arr.size == 0:
            # ADVICE r3: empty blocks must carry the SAME Arrow type as
            # non-empty ones (fixed_size_list<float32, dim>) or schema
            # unification breaks when an empty block lands mid-pipeline
            emb = pa.array([], type=pa.list_(pa.float32(), self.dim))
        else:
            emb = pa.FixedSizeListArray.from_arrays(
                pa.array(arr.ravel(), type=pa.float32()), arr.shape[1]
            )
        return batch.append_column("embedding", emb)
