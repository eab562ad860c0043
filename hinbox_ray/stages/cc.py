"""Connected components over candidate-edge Datasets.

Implements the alternating **large-star / small-star** contraction of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC
2014): each round is a ``groupby(node)`` shuffle over the *edge* set
(vocabulary-scale, not corpus-scale), converging in O(log n) rounds to a
star forest where every node points at its component's minimum node id.
This is the north rule's "connected-components union-find over
candidate-pair batches": no driver-side state, arbitrary component
sizes, deterministic output.

Edges are materialized between rounds (they are small — bounded by the
blocking stage's per-block caps) so each round's shuffle does not replay
the whole upstream pipeline.

``components_driver`` is the explicit small-data fallback (union-find on
the driver) used only when the caller knows the edge set is tiny; the
dataset-native path is the default and the scale path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pandas as pd

_EMPTY = pd.DataFrame({"u": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.int64)})


def _symmetrize(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "u": pd.concat([df["u"], df["v"]], ignore_index=True),
            "v": pd.concat([df["v"], df["u"]], ignore_index=True),
        }
    )


def _large_star_group(g: pd.DataFrame) -> pd.DataFrame:
    u = int(g["u"].iloc[0])
    nbrs = np.unique(g["v"].to_numpy())
    m = min(int(nbrs.min()), u)
    big = nbrs[nbrs > u]
    if len(big) == 0:
        return _EMPTY
    out = pd.DataFrame({"u": big.astype(np.int64), "v": np.int64(m)})
    return out[out["u"] != out["v"]]


def _orient_max_min(df: pd.DataFrame) -> pd.DataFrame:
    u = df["u"].to_numpy()
    v = df["v"].to_numpy()
    return pd.DataFrame(
        {"u": np.maximum(u, v).astype(np.int64), "v": np.minimum(u, v).astype(np.int64)}
    )


def _small_star_group(g: pd.DataFrame) -> pd.DataFrame:
    u = int(g["u"].iloc[0])
    nbrs = np.unique(g["v"].to_numpy())
    m = int(nbrs.min())
    nodes = np.append(nbrs, u)
    keep = nodes[nodes != m]
    if len(keep) == 0:
        return _EMPTY
    return pd.DataFrame({"u": keep.astype(np.int64), "v": np.int64(m)})


def _checksum(edges) -> Tuple[int, int]:
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(dtype=np.uint64)
        v = df["v"].to_numpy(dtype=np.uint64)
        mix = u * np.uint64(0x9E3779B97F4A7C15) ^ v * np.uint64(0xC2B2AE3D27D4EB4F)
        return pd.DataFrame({"n": [len(df)], "c": [int(mix.sum(dtype=np.uint64))]})

    agg = edges.map_batches(partial, batch_format="pandas").to_pandas()
    if agg.empty:
        return 0, 0
    return int(agg["n"].sum()), int(np.uint64(agg["c"].astype(np.uint64).sum()))


def connected_components(
    edges_ds, *, max_rounds: int = 24, small_edge_threshold: int = 200_000
):
    """edges(u:int64, v:int64) → Dataset(node_id:int64, component:int64).

    Every node that appears in an edge gets a row; the component id is
    the minimum node id of the component. Singleton nodes (no edges) are
    absent — callers left-join and default to the node's own id.

    Size-based physical plan (the same decision as broadcast-vs-shuffle
    join): below ``small_edge_threshold`` edges, the log-n shuffle
    rounds cost more in fixed stage latency than the whole problem —
    run union-find on the driver and return it as a Dataset. Above it,
    the dataset-native star-contraction loop is the scale path.
    """
    edges = edges_ds.materialize()
    n_edges = edges.count()
    if 0 < n_edges <= small_edge_threshold:
        import ray.data as rd

        mapping = components_driver(edges)
        items = sorted(mapping.items())
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "node_id": np.array([k for k, _ in items], dtype=np.int64),
                    "component": np.array([v for _, v in items], dtype=np.int64),
                }
            )
        )
    if n_edges == 0:
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "node_id": pa.array([], pa.int64()),
                    "component": pa.array([], pa.int64()),
                }
            )
        )

    # Alternate large-star / small-star, REPLACING the edge set each
    # half-round (Kiveris et al. Alg. 2). Unioning with the previous
    # round's edges — the naive reading — accumulates stale edges and
    # explodes on dense graphs (a 2k-node random graph ran out of
    # memory before converging). Per-batch drop_duplicates bounds
    # transient multi-edges without a global dedup shuffle; the
    # converged star forest is duplicate-free, so the checksum settles.
    prev = (-1, -1)
    for _ in range(max_rounds):
        large = (
            edges.map_batches(_symmetrize, batch_format="pandas")
            .groupby("u")
            .map_groups(_large_star_group, batch_format="pandas")
        )
        small = (
            large.map_batches(_orient_max_min, batch_format="pandas")
            .groupby("u")
            .map_groups(_small_star_group, batch_format="pandas")
            .map_batches(
                lambda df: df.drop_duplicates(), batch_format="pandas"
            )
        )
        edges = small.materialize()
        sig = _checksum(edges)
        if sig == prev:
            break
        prev = sig

    # converged star forest: (child → root) plus root self-rows
    def to_mapping(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node_id": df["u"].astype(np.int64),
                "component": df["v"].astype(np.int64),
            }
        )

    children = edges.map_batches(to_mapping, batch_format="pandas")
    roots = (
        edges.groupby("v")
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "node_id": [int(g["v"].iloc[0])],
                    "component": [int(g["v"].iloc[0])],
                }
            ),
            batch_format="pandas",
        )
    )
    # repartition: groupby rounds leave many schema-less empty blocks
    # which break downstream hash joins (pyarrow needs the key column in
    # every block); coalescing also rightsizes this vocab-scale table.
    return children.union(roots).repartition(8)


def components_driver(edges_ds) -> Dict[int, int]:
    """Driver-side union-find fallback for provably-small edge sets."""
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for batch in edges_ds.iter_batches(batch_format="pandas"):
        for u, v in zip(batch["u"], batch["v"]):
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                # union by min id keeps determinism
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
    return {n: find(n) for n in list(parent)}
