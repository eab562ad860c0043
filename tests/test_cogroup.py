"""Co-group attach correctness (the Dataset.join replacement on the
canonical path — a hash join here silently split entity clusters)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _raw_frame(node_ids):
    n = len(node_ids)
    return pd.DataFrame(
        {
            "entity_type": ["people"] * n,
            "name": [f"n{i}" for i in range(n)],
            "attr_type": [""] * n,
            "start_date": [""] * n,
            "end_date": [""] * n,
            "event_type": [""] * n,
            "description": [""] * n,
            "aliases": [""] * n,
            "n_mentions": np.ones(n, dtype=np.int64),
            "first_url": [f"https://x/{i}" for i in range(n)],
            "first_ord": np.zeros(n, dtype=np.int64),
            "first_ts": pd.to_datetime(["2020-01-01"] * n),
            "evidence": [""] * n,
            "node_id": np.array(node_ids, dtype=np.int64),
        }
    )


def test_attach_component_matches_and_defaults(ray_session):
    import ray.data as rd

    from hinbox_ray.stages.cogroup import attach_component

    # 63-bit ids — the range where a dtype drift would corrupt a join
    ids = [(1 << 62) + 5, (1 << 61) + 9, 77, 12345]
    raw = rd.from_pandas(_raw_frame(ids))
    comps = rd.from_pandas(
        pd.DataFrame(
            {
                "node_id": np.array(ids[:2], dtype=np.int64),
                "component": np.array([42, 42], dtype=np.int64),
            }
        )
    )
    out = attach_component(raw, comps).to_pandas()
    got = dict(zip(out.node_id, out.component))
    assert got[ids[0]] == 42 and got[ids[1]] == 42
    # singletons default to their own node id
    assert got[77] == 77 and got[12345] == 12345
    assert len(out) == 4
    # every raw column survives
    assert "evidence" in out.columns and "first_ord" in out.columns


def test_attach_entity_id_inner_semantics(ray_session):
    import ray.data as rd

    from hinbox_ray.stages.cogroup import attach_entity_id

    mention_nodes = rd.from_pandas(
        pd.DataFrame(
            {
                "node_id": np.array([1, 1, 2, 3], dtype=np.int64),
                "url": ["u1", "u2", "u3", "u4"],
            }
        )
    )
    nmap = rd.from_pandas(
        pd.DataFrame(
            {
                "node_id": np.array([1, 2], dtype=np.int64),
                "entity_id": ["e:a", "e:b"],
            }
        )
    )
    out = attach_entity_id(mention_nodes, nmap).to_pandas()
    pairs = set(zip(out.entity_id, out.url))
    # node 3 has no mapping → dropped (inner); 1 keeps both urls
    assert pairs == {("e:a", "u1"), ("e:a", "u2"), ("e:b", "u3")}


def test_bucketed_map_groups_matches_plain_groupby(ray_session):
    """The bucketed shuffle must be semantically identical to one Ray
    group per key — same groups, same kernel outputs — while creating
    only O(n_buckets) Ray groups."""
    import ray.data as rd

    from hinbox_ray.stages.cogroup import bucketed_map_groups

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 60, 700).astype(np.int64),
            "k2": rng.choice(list("abcd"), 700),
            "v": rng.integers(0, 100, 700).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": np.array([g["k"].iloc[0]], dtype=np.int64),
                "k2": [str(g["k2"].iloc[0])],
                "s": np.array([int(g["v"].sum())], dtype=np.int64),
                "n": np.array([len(g)], dtype=np.int64),
            }
        )

    got = (
        bucketed_map_groups(ds, ["k", "k2"], kernel, n_buckets=7)
        .to_pandas()
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["k", "k2"], sort=True)
        .apply(kernel, include_groups=True)
        .reset_index(drop=True)
        .sort_values(["k", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_attach_component_63bit_ids_exact(ray_session):
    """Component ids are 63-bit siphashes; the left-attach must stay
    integer-exact (a float64 NaN/fillna path rounds above 2^53 and
    merges unrelated clusters — regression for exactly that)."""
    import ray.data as rd

    from hinbox_ray.stages.cogroup import RAW_COLS, attach_component

    base = np.int64(1) << np.int64(62)
    nids = base + np.array([1025, 1027, 1029], dtype=np.int64)

    raw = pd.DataFrame({c: ["x"] * 3 for c in RAW_COLS if c != "node_id"})
    raw["n_mentions"] = np.int64(1)
    raw["first_ord"] = np.int64(0)
    raw["first_ts"] = pd.Timestamp("2024-01-01")
    raw["node_id"] = nids
    comps = pd.DataFrame(
        {
            # the two linked nodes share a component; third is singleton
            "node_id": nids[:2],
            "component": np.array([nids[0], nids[0]], dtype=np.int64),
        }
    )
    out = (
        attach_component(rd.from_pandas(raw), rd.from_pandas(comps))
        .to_pandas()
        .sort_values("node_id")
        .reset_index(drop=True)
    )
    assert out["component"].dtype == np.int64
    assert out["component"].tolist() == [
        int(nids[0]),
        int(nids[0]),
        int(nids[2]),  # singleton keeps its own 63-bit id, bit-exact
    ]
