"""Sort-shuffle co-group joins for the canonicalization path.

``Dataset.join`` (hash-shuffle) showed per-process row-misrouting on
this Ray build when both sides are pandas-origin blocks: the same
materialized inputs joined 19/19 keys in one interpreter and 0/19 in
another (see tests/test_cogroup.py). The canonical path cannot tolerate
a silently-dropped component row — one misrouted key splits an entity
cluster — so the two vocabulary-scale joins in this path use a
union + ``groupby(key).map_groups`` co-group instead: the sort-based
shuffle routes both sides by the same comparison key, so matching is
exact by construction. Cost: one sort shuffle over |left|+|right| rows,
same asymptotics as the hash join, on vocabulary-scale tables.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd

# raw-entity column order (resolve._reduce_mention_group output + node_id)
RAW_COLS = [
    "entity_type",
    "name",
    "attr_type",
    "start_date",
    "end_date",
    "event_type",
    "description",
    "aliases",
    "n_mentions",
    "first_url",
    "first_ord",
    "first_ts",
    "evidence",
    "node_id",
]

_STR_COLS = [
    "entity_type",
    "name",
    "attr_type",
    "start_date",
    "end_date",
    "event_type",
    "description",
    "aliases",
    "first_url",
    "evidence",
]


def attach_component(raw_ds, comps_ds):
    """raw(node_id, ...) ⟕ comps(node_id, component) via co-group.

    Returns the raw columns + ``component`` (int64); nodes absent from
    comps (singletons — no candidate edges) get their own node_id.
    """

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df[RAW_COLS].copy()
        df["component"] = np.int64(-1)
        df["_src"] = np.int8(0)
        return df

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(index=range(len(df)))
        for c in _STR_COLS:
            out[c] = ""
        out["n_mentions"] = np.int64(0)
        out["first_ord"] = np.int64(0)
        out["first_ts"] = pd.NaT
        out["node_id"] = df["node_id"].astype(np.int64).to_numpy()
        out = out[RAW_COLS]
        out["component"] = df["component"].astype(np.int64).to_numpy()
        out["_src"] = np.int8(1)
        return out

    def resolve_group(g: pd.DataFrame) -> pd.DataFrame:
        maps = g[g["_src"] == 1]
        rows = g[g["_src"] == 0]
        if rows.empty:
            return rows.drop(columns=["_src"])
        comp = (
            int(maps["component"].iloc[0])
            if len(maps)
            else int(rows["node_id"].iloc[0])
        )
        rows = rows.drop(columns=["_src"]).copy()
        rows["component"] = np.int64(comp)
        return rows

    left = raw_ds.map_batches(tag_left, batch_format="pandas")
    right = comps_ds.map_batches(tag_right, batch_format="pandas")
    return left.union(right).groupby("node_id").map_groups(
        resolve_group, batch_format="pandas"
    )


def _url_salt(urls: pd.Series, n_salts: int) -> np.ndarray:
    """Deterministic per-url salt (pandas' fixed-key siphash — stable
    across processes and nodes)."""
    return (
        pd.util.hash_pandas_object(urls, index=False).to_numpy() % n_salts
    ).astype(np.int64)


def attach_entity_id(mention_nodes_ds, node_map_ds, *, n_salts: int = 16):
    """(node_id, url) ⋈ (node_id → entity_id) via SALTED co-group (inner).

    Hot-entity skew handling (the north rule's "salted repartitioning"):
    a popular name ("United States") concentrates a large fraction of
    all mention rows under one node_id, so an unsalted groupby puts them
    in one reduce task. The group key is (node_id, salt(url)); the tiny
    node→entity map is replicated to every salt. Salting by URL also
    keeps every duplicate of a given (entity, url) pair in the same
    salted group, so downstream dedup stays exact.
    """

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node_id": df["node_id"].astype(np.int64).to_numpy(),
                "salt": _url_salt(df["url"], n_salts),
                "url": df["url"].astype(str),
                "entity_id": "",
                "_src": np.int8(0),
            }
        )

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        reps = pd.DataFrame(
            {
                "node_id": np.repeat(
                    df["node_id"].astype(np.int64).to_numpy(), n_salts
                ),
                "salt": np.tile(np.arange(n_salts, dtype=np.int64), n),
                "url": "",
                "entity_id": np.repeat(
                    df["entity_id"].astype(str).to_numpy(), n_salts
                ),
                "_src": np.int8(1),
            }
        )
        return reps

    def resolve_group(g: pd.DataFrame) -> pd.DataFrame:
        maps = g[g["_src"] == 1]
        rows = g[g["_src"] == 0]
        if rows.empty or maps.empty:
            return pd.DataFrame(
                {
                    "entity_id": pd.Series(dtype=object),
                    "url": pd.Series(dtype=object),
                    "salt": pd.Series(dtype=np.int64),
                }
            )
        eid = str(maps["entity_id"].iloc[0])
        # within-group dedup is exact for this node (same url → same salt)
        urls = rows["url"].drop_duplicates().to_numpy()
        return pd.DataFrame(
            {
                "entity_id": eid,
                "url": urls,
                "salt": np.int64(int(rows["salt"].iloc[0])),
            }
        )

    left = mention_nodes_ds.map_batches(tag_left, batch_format="pandas")
    right = node_map_ds.map_batches(tag_right, batch_format="pandas")
    return left.union(right).groupby(["node_id", "salt"]).map_groups(
        resolve_group, batch_format="pandas"
    )
