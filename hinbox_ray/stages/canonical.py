"""Entity resolution, part 2: components → canonical entities → triples.

Per-component canonical election reproduces the reference's merge-time
canonical-key selection (src/engine/mergers.py:231-274,962-998) without
its order dependence: every member is scored with
``canonical_score_with_bonuses`` (base canonical score + containment and
acronym-derivation bonuses against the other members), and the winner is
the FIRST member in first-seen order (min url — the reference processes
articles in input order) whose score is within 0.3 of the maximum —
mirroring "the existing name keeps the key unless the incoming one is
better by more than 0.3".

Outputs:
- ``entities`` Dataset: one row per canonical entity (profile-shaped
  narrow columns + aliases + member node ids),
- ``node_map`` Dataset: (node_id → entity_id) used to rewrite mention
  rows into ``mentioned_in`` triples,
- triple emission kernels (SURVEY.md §7.0 triple view).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DomainConfig
from ..functions.hashing import entity_id as make_entity_id
from ..functions.names import canonical_score_with_bonuses
from .resolve import join_aliases, split_aliases

_SWAP_MARGIN = 0.3


def _elect(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("first_url", kind="mergesort")  # first-seen order
    names = g["name"].tolist()
    all_variants: List[str] = []
    for _, row in g.iterrows():
        all_variants.append(row["name"])
        all_variants.extend(split_aliases(row["aliases"]))

    scores = [
        canonical_score_with_bonuses(n, [v for v in all_variants if v != n])
        for n in names
    ]
    max_score = max(scores)
    win_idx = next(i for i, s in enumerate(scores) if s >= max_score - _SWAP_MARGIN)
    winner = g.iloc[win_idx]
    etype = str(winner["entity_type"])

    def first_nonempty(col: str) -> str:
        vals = g[col][g[col] != ""]
        return str(vals.iloc[0]) if len(vals) else ""

    start_date = str(winner["start_date"]) or first_nonempty("start_date")
    canon_name = str(winner["name"])

    seen = {canon_name.lower()}
    aliases: List[str] = []
    for v in all_variants:
        if v and v.lower() not in seen:
            seen.add(v.lower())
            aliases.append(v)

    if etype == "people":
        key = canon_name
    elif etype in ("organizations", "locations"):
        key = f"{canon_name}\x1f{winner['attr_type']}"
    else:
        key = f"{canon_name}\x1f{start_date}"

    return pd.DataFrame(
        {
            "entity_id": [make_entity_id(etype, key)],
            "entity_type": [etype],
            "name": [canon_name],
            "attr_type": [str(winner["attr_type"])],
            "start_date": [start_date],
            "end_date": [first_nonempty("end_date")],
            "event_type": [first_nonempty("event_type")],
            "description": [first_nonempty("description")],
            "aliases": [join_aliases(aliases)],
            "n_mentions": [int(g["n_mentions"].sum())],
            "first_url": [str(g["first_url"].min())],
            "first_ts": [g["first_ts"].min()],
            "profile_text": [str(winner["evidence"])],
            "member_nodes": [g["node_id"].astype(np.int64).tolist()],
        }
    )


def canonical_entities(
    raw_entities_ds,
    components_ds,
    *,
    num_partitions: int = 32,
):
    """raw entities ⋈ components → per-component election (SHUFFLE)."""
    joined = raw_entities_ds.join(
        components_ds,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("node_id",),
    )

    def fill_singletons(df: pd.DataFrame) -> pd.DataFrame:
        comp = df["component"]
        df = df.copy()
        df["component"] = (
            comp.fillna(df["node_id"]).astype(np.int64)
            if comp.isna().any()
            else comp.astype(np.int64)
        )
        return df

    joined = joined.map_batches(fill_singletons, batch_format="pandas")
    return joined.groupby("component").map_groups(_elect, batch_format="pandas")


def node_map(entities_ds):
    """(node_id → entity_id) mapping dataset (vocabulary-scale)."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        node_ids: List[int] = []
        eids: List[str] = []
        for _, row in df.iterrows():
            for n in row["member_nodes"]:
                node_ids.append(int(n))
                eids.append(row["entity_id"])
        return pd.DataFrame(
            {"node_id": np.array(node_ids, dtype=np.int64), "entity_id": eids}
        )

    return entities_ds.map_batches(explode, batch_format="pandas")


# ──────────────────────────────────────────────
# Triple emission (SURVEY.md §7.0)
# ──────────────────────────────────────────────

TRIPLES_SCHEMA = pa.schema(
    [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
)


def _entity_triples_batch(df: pd.DataFrame) -> pd.DataFrame:
    subj: List[str] = []
    pred: List[str] = []
    obj: List[str] = []

    def emit(s: str, p: str, o: str):
        if o:
            subj.append(s)
            pred.append(p)
            obj.append(o)

    for _, row in df.iterrows():
        eid = row["entity_id"]
        emit(eid, "rdf:type", row["entity_type"])
        emit(eid, "name", row["name"])
        for a in split_aliases(row["aliases"]):
            emit(eid, "alias", a)
        if row["entity_type"] in ("organizations", "locations"):
            emit(eid, "type", row["attr_type"])
        elif row["entity_type"] == "events":
            emit(eid, "event_type", row["event_type"])
            emit(eid, "start_date", row["start_date"])
            emit(eid, "end_date", row["end_date"])
    return pd.DataFrame({"subj": subj, "pred": pred, "obj": obj})


def entity_triples(entities_ds):
    return entities_ds.map_batches(_entity_triples_batch, batch_format="pandas")


def mention_triples(mentions_ds, node_map_ds, *, num_partitions: int = 32):
    """(entity_id, "mentioned_in", url) — one per linked article
    (reference: article link-once at mergers.py:1002-1017)."""
    from .resolve import add_node_id

    def project(df: pd.DataFrame) -> pd.DataFrame:
        df = add_node_id(df)
        return df[["node_id", "url"]]

    mention_nodes = mentions_ds.map_batches(project, batch_format="pandas")
    joined = mention_nodes.join(
        node_map_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("node_id",),
    )

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": df["entity_id"],
                "pred": "mentioned_in",
                "obj": df["url"],
            }
        )

    triples = joined.map_batches(emit, batch_format="pandas")
    # distinct: two raw names in one doc can resolve to one entity
    return triples.groupby(["subj", "obj"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
