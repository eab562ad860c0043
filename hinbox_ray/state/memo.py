"""Content-addressed extraction memo (reference S7).

The reference memoizes extraction results per
(cache-version, entity-type, model, temperature, content-hash,
prompt-hash, schema-hash) in an atomic JSON sidecar store
(/root/reference/src/utils/extraction_cache.py:58-177, key at :88-111),
so a re-run — even after a config-version bump that changes OTHER
inputs — re-extracts only documents whose key inputs changed. Lineage
manifests (state/lineage.py) resume per *partition*; this memo resumes
per *document*: a modified shard re-extracts only its modified docs.

Ray-native layout (``memo_dir/``):

- ``index/*.parquet``  — (memo_key, url, n_mentions): one row per
  processed doc, INCLUDING zero-mention docs (so they hit next time);
- ``data/*.parquet``   — memo_key + the mention schema: the memoized
  extractor output, replayed for hits.

Both the hit/miss split and the replay are sort-shuffle co-groups on
``hash(memo_key) % 512`` buckets (see stages/cogroup.py for why not
``Dataset.join``, and for the bucketed-grouping invariant: one Ray
group per *document* key would make the fixed per-group cost dominate
the very resume the memo exists to accelerate) — no driver-side key
set, so the memo can be corpus-scale. Writes are tmp + ``os.replace``
(atomic), mirroring the reference's sidecar.

Replay semantics mirror the reference's reattach
(extraction_cache.py: cached results are re-attached to the CURRENT
article): every hit doc keeps its own url/warc_ts and the memoized
mention fields are fanned out per hit doc — a doc whose content matches
an earlier doc at a *different* url gets the mentions attributed to
itself, not to the absent old url. The append-only data dir may hold
duplicate rows for a key (concurrent runs, or a crash between the data
append and the index append followed by a re-extract); replay dedups
the payload per key before fanning out.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DomainConfig

MEMO_CACHE_VERSION = 1


def model_id(cfg: Optional[DomainConfig] = None) -> str:
    """Identity of the extraction model+domain — a different extractor
    or domain config must miss the memo (reference key semantics)."""
    cfg = cfg or DomainConfig()
    return f"gazetteer-lexicon|{cfg.domain}"


def memo_key(text: str, cfg: Optional[DomainConfig] = None, *,
             version: int = MEMO_CACHE_VERSION) -> str:
    """sha256 over every output-affecting input
    (extraction_cache.make_key:88-111 collapsed to the deterministic
    extractor's inputs: cache version, model id, content hash)."""
    content = hashlib.sha256(text.encode("utf-8")).hexdigest()
    parts = f"extraction|v{version}|{model_id(cfg)}|content={content}"
    return hashlib.sha256(parts.encode("utf-8")).hexdigest()


def _add_memo_key(cfg: Optional[DomainConfig], version: int):
    def add(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["memo_key"] = [memo_key(t or "", cfg, version=version) for t in df["text"]]
        return df

    return add


def _list_parquet(d: str):
    if not os.path.isdir(d):
        return []
    return [
        os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]


def _atomic_write_dir(ds, final_dir: str) -> None:
    """write_parquet into a tmp dir, then atomically move each file into
    the (append-only) final dir. File names get a content-derived prefix
    so concurrent writers never collide destructively."""
    os.makedirs(final_dir, exist_ok=True)
    tmp = final_dir + f".tmp-{os.getpid()}"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    if not os.path.isdir(tmp):  # empty dataset writes nothing
        return
    for f in sorted(os.listdir(tmp)):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(tmp, f)
        with open(src, "rb") as fh:
            tag = hashlib.sha256(fh.read(65536)).hexdigest()[:12]
        os.replace(src, os.path.join(final_dir, f"part-{tag}-{f}"))
    shutil.rmtree(tmp, ignore_errors=True)


def extract_with_memo(
    docs_ds,
    memo_dir: str,
    cfg: Optional[DomainConfig] = None,
    *,
    concurrency: Optional[int] = None,
    batch_size: int = 256,
    version: int = MEMO_CACHE_VERSION,
) -> Tuple["object", Dict[str, int]]:
    """docs → mentions, extracting ONLY memo misses.

    Returns (mentions Dataset, stats {"hits": H, "misses": M}). Misses
    are extracted with the standard actor pool, their results appended
    to the memo (index + data); hits are replayed from the memo data
    files without touching the extractor.
    """
    import ray.data as rd

    from ..stages.mentions import MENTIONS_SCHEMA, MentionExtractor

    cfg = cfg or DomainConfig()
    keyed = docs_ds.map_batches(
        _add_memo_key(cfg, version), batch_format="pandas"
    )

    idx_files = _list_parquet(os.path.join(memo_dir, "index"))

    from ..stages.cogroup import key_buckets

    n_buckets = 512

    if not idx_files:
        misses = keyed
        hit_docs = None
    else:
        index = rd.read_parquet(idx_files, columns=["memo_key"])

        def tag_doc(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["memo_key", "url", "warc_ts", "text"]].copy()
            out["_src"] = np.int8(0)
            out["_gbucket"] = key_buckets(out, ["memo_key"], n_buckets)
            return out

        def tag_idx(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "memo_key": df["memo_key"].astype(str),
                    "url": "",
                    "warc_ts": pd.NaT,
                    "text": "",
                    "_src": np.int8(1),
                }
            )
            out["_gbucket"] = key_buckets(out, ["memo_key"], n_buckets)
            return out

        def split_bucket(g: pd.DataFrame) -> pd.DataFrame:
            # one vectorized isin per bucket — never one Ray group per doc
            docs = g[g["_src"] == 0]
            if docs.empty:  # bucket holds only memo entries, no run docs
                return pd.DataFrame(
                    {
                        "memo_key": pd.Series(dtype=object),
                        "url": pd.Series(dtype=object),
                        "warc_ts": pd.Series(dtype="datetime64[us]"),
                        "text": pd.Series(dtype=object),
                        "_hit": pd.Series(dtype=np.int8),
                    }
                )
            idx_keys = g.loc[g["_src"] == 1, "memo_key"].unique()
            out = docs.drop(columns=["_src", "_gbucket"]).copy()
            hit = out["memo_key"].isin(idx_keys).to_numpy()
            # hit docs KEEP url/warc_ts (replay reattaches mentions to
            # the current doc); only the text can be thinned away.
            out.loc[hit, "text"] = ""
            out["_hit"] = hit.astype(np.int8)
            return out

        cg = (
            keyed.map_batches(tag_doc, batch_format="pandas")
            .union(index.map_batches(tag_idx, batch_format="pandas"))
            .groupby("_gbucket")
            .map_groups(split_bucket, batch_format="pandas")
            .materialize()
        )
        misses = cg.map_batches(
            lambda df: df[df["_hit"] == 0].drop(columns=["_hit"]),
            batch_format="pandas",
        )
        hit_docs = cg.map_batches(
            lambda df: df[df["_hit"] == 1][["memo_key", "url", "warc_ts"]],
            batch_format="pandas",
        )

    n_miss = misses.count()
    n_hit = hit_docs.count() if hit_docs is not None else 0

    fresh = None
    if n_miss:
        misses = misses.materialize()

        class _MemoExtractor(MentionExtractor):
            """Extractor emitting memo_key per mention row: the key and
            the text are co-located in the input batch, so no
            driver-side url→key map is ever built."""

            def __call__(self, batch: pa.Table) -> pa.Table:
                key_of = dict(
                    zip(
                        batch.column("url").to_pylist(),
                        batch.column("memo_key").to_pylist(),
                    )
                )
                base = super().__call__(batch)
                mk = [key_of[u] for u in base.column("url").to_pylist()]
                return base.append_column(
                    "memo_key", pa.array(mk, type=pa.string())
                )

        if concurrency is None:
            import ray as _ray

            n_cpu = (
                int(_ray.cluster_resources().get("CPU", 4))
                if _ray.is_initialized()
                else 4
            )
            concurrency = max(2, (n_cpu * 3) // 4)
        data_rows = misses.map_batches(
            _MemoExtractor,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        ).materialize()
        mentions_fresh = data_rows.drop_columns(["memo_key"])
        _atomic_write_dir(data_rows, os.path.join(memo_dir, "data"))

        # index rows: EVERY miss doc, including zero-mention ones.
        # Per-url mention counts attach via a bucketed co-group — the
        # old driver-side Series (one entry per miss url, then shipped
        # into every task's closure) was a corpus-scale collect on
        # exactly the resume path the memo exists to scale.
        def tag_miss(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "memo_key": df["memo_key"].astype(str),
                    "url": df["url"].astype(str),
                    "n_mentions": np.int64(-1),
                    "_src": np.int8(0),
                }
            )
            out["_gbucket"] = key_buckets(out, ["url"], n_buckets)
            return out

        def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("url", sort=False).size()
            out = pd.DataFrame(
                {
                    "memo_key": "",
                    "url": g.index.astype(str),
                    "n_mentions": g.to_numpy().astype(np.int64),
                    "_src": np.int8(1),
                }
            )
            out["_gbucket"] = key_buckets(out, ["url"], n_buckets)
            return out

        def attach_counts(g: pd.DataFrame) -> pd.DataFrame:
            m = g[g["_src"] == 0]
            c = (
                g[g["_src"] == 1]
                .groupby("url", sort=False)["n_mentions"]
                .sum()
            )
            return pd.DataFrame(
                {
                    "memo_key": m["memo_key"].astype(str).to_numpy(),
                    "url": m["url"].astype(str).to_numpy(),
                    "n_mentions": m["url"]
                    .map(c)
                    .fillna(0)
                    .astype(np.int64)
                    .to_numpy(),
                }
            )

        tagged = misses.map_batches(tag_miss, batch_format="pandas").union(
            mentions_fresh.map_batches(cnt_partial, batch_format="pandas")
        )
        index_rows = tagged.groupby("_gbucket").map_groups(
            attach_counts, batch_format="pandas"
        )
        _atomic_write_dir(index_rows, os.path.join(memo_dir, "index"))
        fresh = mentions_fresh

    replayed = None
    data_files = _list_parquet(os.path.join(memo_dir, "data"))
    if n_hit and data_files:
        data = rd.read_parquet(data_files)
        mcols = list(MENTIONS_SCHEMA.names)
        # memoized mention fields = everything except the doc identity,
        # which replay takes from the CURRENT hit doc
        payload_cols = [c for c in mcols if c not in ("url", "warc_ts")]

        def tag_data(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["memo_key", *mcols]].copy()
            out["_src"] = np.int8(0)
            out["_gbucket"] = key_buckets(out, ["memo_key"], n_buckets)
            return out

        def tag_hit(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "memo_key": df["memo_key"].astype(str),
                    "url": df["url"].astype(str),
                    "warc_ts": df["warc_ts"],
                }
            )
            for c in payload_cols:
                out[c] = ""
            out["n_mentions"] = np.int32(0)
            out["doc_ord"] = np.int32(0)
            out["aliases"] = [[] for _ in range(len(df))]
            out = out[["memo_key", *mcols]]
            out["_src"] = np.int8(1)
            out["_gbucket"] = key_buckets(out, ["memo_key"], n_buckets)
            return out

        def replay_bucket(g: pd.DataFrame) -> pd.DataFrame:
            # vectorized per bucket: dedup each key's payload (the
            # append-only data dir may hold duplicates), then fan it out
            # to every hit doc of that key via one merge — each replayed
            # row carries the hit doc's own url/warc_ts.
            data_rows = g[g["_src"] == 0]
            hits = g[g["_src"] == 1]
            if data_rows.empty or hits.empty:
                return data_rows.iloc[0:0][mcols]
            payload = data_rows[["memo_key", *payload_cols]].drop_duplicates(
                ["memo_key", "doc_ord", "entity_type", "name"]
            )
            out = hits[["memo_key", "url", "warc_ts"]].merge(
                payload, on="memo_key", how="inner"
            )
            return out[mcols]

        replayed = (
            data.map_batches(tag_data, batch_format="pandas")
            .union(hit_docs.map_batches(tag_hit, batch_format="pandas"))
            .groupby("_gbucket")
            .map_groups(replay_bucket, batch_format="pandas")
        )

    stats = {"hits": int(n_hit), "misses": int(n_miss)}
    if fresh is not None and replayed is not None:
        return fresh.union(replayed), stats
    if fresh is not None:
        return fresh, stats
    if replayed is not None:
        return replayed, stats
    import ray.data as rd2

    return rd2.from_arrow(MENTIONS_SCHEMA.empty_table()), stats
