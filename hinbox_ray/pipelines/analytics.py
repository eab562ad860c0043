"""Relational operators over the driver's TPC-H-ish parquet tables.

Each function takes ``sf_dir`` and returns a ``ray.data.Dataset`` whose
rows match a DuckDB oracle SQL (registered in ``__ray_entry__.py``)
column-for-column. They exercise the engine's relational surface — the
Ray mapping column of SURVEY.md §2 (groupby/aggregate, hash join,
broadcast join, filter/project, sort/limit/top-k) — on independent
data, alongside the KG flagship pipeline.

Scale notes (100 TB posture):

- every read prunes columns (``read_parquet(columns=[...])``);
- aggregations use ``Dataset.groupby().aggregate(...)`` which combines
  partially per block before the shuffle;
- the one genuinely large join (orders ⋈ customer) is a hash
  ``Dataset.join``; all small sides (region, nation, part for the
  top-k lookup) are broadcast — read once on the driver, shipped to
  tasks in the closure, O(small) per task, no shuffle.

Float determinism: the driver compares engines by exact value hash, so
derived floats never cross the boundary raw. Policy:

- raw parquet columns pass through untouched (bit-identical by
  construction);
- per-row derived values use ``floor(expr * scale + 0.5)`` with the
  exact same IEEE op sequence as the oracle SQL → always identical;
- cross-row sums of non-integral doubles are scaled so the floor
  boundary sits ≫ any summation-order error (dollars for ~1e9 sums,
  cents for ~1e5 sums); sums of integral doubles are exact (< 2^53).
"""

from __future__ import annotations

import os
from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Sum

_ONE = pa.scalar(1.0)
_HALF = pa.scalar(0.5)


def _path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def read_table(
    sf_dir: str, table: str, columns: Optional[List[str]] = None
) -> ray.data.Dataset:
    """Column-pruned streaming parquet read."""
    return ray.data.read_parquet(_path(sf_dir, table), columns=columns)


def _small_table(sf_dir: str, table: str, columns: List[str]) -> pa.Table:
    """Driver-side read of a broadcast-small side (region/nation/part)."""
    return pq.read_table(_path(sf_dir, table), columns=columns)


def _floor_scaled(arr: pa.ChunkedArray, scale: float) -> pa.ChunkedArray:
    """CAST(floor(x*scale + 0.5) AS BIGINT) — same IEEE ops as DuckDB."""
    x = pc.cast(arr, pa.float64())
    if scale != 1.0:
        x = pc.multiply(x, pa.scalar(float(scale)))
    return pc.cast(pc.floor(pc.add(x, _HALF)), pa.int64())


def _int_col(batch: pa.Table, col: str, scale: float = 1.0) -> pa.Table:
    idx = batch.schema.get_field_index(col)
    return batch.set_column(idx, col, _floor_scaled(batch[col], scale))


# ---------------------------------------------------------------------------
# Aggregations


def lineitem_agg(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-style pricing summary.

    read(4 cols) → map_batches(add disc_price, zero-copy Arrow) →
    groupby(returnflag, linestatus).aggregate(partial-combined sums).
    sum_qty is exact (integral quantities); price sums round to whole
    dollars; avg_qty_e2 = floor(sum/count·100+.5) from exact integers.
    """

    def add_disc_price(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(_ONE, batch["l_discount"])
        )
        return batch.append_column("disc_price", disc_price)

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )
    out = (
        ds.map_batches(add_disc_price, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        avg = pc.divide(
            pc.cast(batch["sum_qty"], pa.float64()),
            pc.cast(batch["count_order"], pa.float64()),
        )
        batch = batch.append_column("avg_qty_e2", _floor_scaled(avg, 100.0))
        batch = _int_col(batch, "sum_qty")
        batch = _int_col(batch, "sum_base_price")
        batch = _int_col(batch, "sum_disc_price")
        return batch

    return out.map_batches(finalize, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def orders_priority_count(sf_dir: str) -> ray.data.Dataset:
    """Order count per priority bucket (groupby + count)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority"])
    return (
        ds.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .sort("o_orderpriority")
    )


def events_daily(sf_dir: str) -> ray.data.Dataset:
    """Events rolled up to (event_type, day): count + sum(value) cents.

    Day is a 'YYYY-MM-DD' string so both engines compare plain strings
    rather than engine-specific timestamp types.
    """

    def add_day(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch["ts"], format="%Y-%m-%d")
        return pa.table(
            {
                "event_type": batch["event_type"],
                "day": day,
                "value": batch["value"],
            }
        )

    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = (
        ds.map_batches(add_day, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value_e2"),
        )
    )
    return out.map_batches(
        lambda b: _int_col(b, "sum_value_e2", 100.0), batch_format="pyarrow"
    ).sort(["event_type", "day"])


def events_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Distinct user_id per event_type.

    Two-level aggregation: groupby(event_type, user_id) collapses to the
    distinct pairs (partial-combined per block, so the shuffle carries
    at most |types|×|users| rows), then a cheap second groupby counts.
    """
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_n")
    )
    return (
        pairs.drop_columns(["_n"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .sort("event_type")
    )


# ---------------------------------------------------------------------------
# Filter / project / sort / top-k


def lineitem_filter_project(sf_dir: str) -> ray.data.Dataset:
    """Predicate + projection: high-quantity line items.

    revenue_e2 is a per-row derived value → identical IEEE op sequence
    as the oracle (price·(1−disc)·100, floor(+.5)).
    """
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def fil(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater_equal(batch["l_quantity"], 48.0))
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(_ONE, batch["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_linenumber": batch["l_linenumber"],
                "l_quantity": _floor_scaled(batch["l_quantity"], 1.0),
                "revenue_e2": _floor_scaled(revenue, 100.0),
            }
        )

    return ds.map_batches(fil, batch_format="pyarrow")


def orders_topk(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Top-k orders by total price (global sort + limit).

    o_totalprice passes through raw (bit-identical); tie-break on
    o_orderkey so both engines pick the same boundary rows.
    """
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    return ds.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(k)


def top_parts_by_quantity(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Pre-aggregate + top-k + broadcast lookup.

    lineitem is groupby-summed on l_partkey (partial combine before the
    shuffle), sorted for the top-k, and only then enriched with the part
    name via a driver-broadcast dict — the part table never shuffles.
    total_qty is a sum of integral doubles → exact BIGINT.
    """
    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    agg = ds.groupby("l_partkey").aggregate(
        Sum("l_quantity", alias_name="total_qty")
    )
    agg = agg.map_batches(
        lambda b: _int_col(b, "total_qty"), batch_format="pyarrow"
    )
    top = agg.sort(["total_qty", "l_partkey"], descending=[True, False]).limit(k)

    part = _small_table(sf_dir, "part", ["p_partkey", "p_name"])
    name_of = dict(zip(part["p_partkey"].to_pylist(), part["p_name"].to_pylist()))

    def attach(batch: pa.Table) -> pa.Table:
        names = pa.array(
            [name_of.get(kk) for kk in batch["l_partkey"].to_pylist()],
            type=pa.string(),
        )
        return pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "p_name": names,
                "total_qty": batch["total_qty"],
            }
        )

    return top.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Joins


def nation_region_count(sf_dir: str) -> ray.data.Dataset:
    """Broadcast join nation ⋈ region → nations per region."""
    region = _small_table(sf_dir, "region", ["r_regionkey", "r_name"])
    rname = dict(
        zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist())
    )

    def attach(batch: pa.Table) -> pa.Table:
        names = pa.array(
            [rname.get(kk) for kk in batch["n_regionkey"].to_pylist()],
            type=pa.string(),
        )
        return pa.table({"region_name": names})

    ds = read_table(sf_dir, "nation", columns=["n_regionkey"])
    return (
        ds.map_batches(attach, batch_format="pyarrow")
        .groupby("region_name")
        .aggregate(Count(alias_name="n_nations"))
        .sort("region_name")
    )


def customer_revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Broadcast map join orders ⋈ customer, aggregate, then nation.

    One plan, one pass over the big side: the (c_custkey → c_nationkey)
    map is a pair of int32 columns (~1 MB per 150k customers at TPC-H
    shape — comfortably broadcastable well past the test scale), built
    once on the driver as a vectorized numpy lookup table and applied
    per batch with ``np.searchsorted`` — no shuffle touches the orders
    stream. At a scale where customer itself stops fitting (≳10⁹
    customers) the plan flips to a hash-partition co-group on custkey
    (stages/cogroup.py); Dataset.join is deliberately avoided here — it
    silently misroutes rows when a block's key dtype drifts (see
    cogroup.py). Revenue rounds to whole dollars (summation-order error
    ≪ 0.5).
    """
    import numpy as np

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _small_table(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    ckeys = np.asarray(cust["c_custkey"].to_numpy(zero_copy_only=False))
    cnats = np.asarray(cust["c_nationkey"].to_numpy(zero_copy_only=False))
    order_ = np.argsort(ckeys, kind="stable")
    ckeys, cnats = ckeys[order_], cnats[order_]

    def attach_nat(batch: pa.Table) -> pa.Table:
        ok = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ckeys, ok)
        pos = np.clip(pos, 0, len(ckeys) - 1)
        hit = ckeys[pos] == ok
        nat = np.where(hit, cnats[pos], -1).astype(np.int32)
        keep = nat >= 0
        return pa.table(
            {
                "c_nationkey": pa.array(nat[keep], type=pa.int32()),
                "o_totalprice": batch["o_totalprice"].filter(pa.array(keep)),
            }
        )

    joined = orders.map_batches(attach_nat, batch_format="pyarrow")
    agg = joined.groupby("c_nationkey").aggregate(
        Count(alias_name="n_orders"),
        Sum("o_totalprice", alias_name="revenue"),
    )

    nation = _small_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    nname = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )

    def attach(batch: pa.Table) -> pa.Table:
        names = pa.array(
            [nname.get(kk) for kk in batch["c_nationkey"].to_pylist()],
            type=pa.string(),
        )
        return pa.table(
            {
                "nation_name": names,
                "n_orders": batch["n_orders"],
                "revenue": _floor_scaled(batch["revenue"], 1.0),
            }
        )

    return agg.map_batches(attach, batch_format="pyarrow").sort("nation_name")


# ---------------------------------------------------------------------------
# Windowed / per-group operators


def events_sessionize(sf_dir: str, gap_s: int = 1800) -> ray.data.Dataset:
    """Session windows per user: a new session starts after a >gap_s
    silence. The windowed-aggregate custom operator Ray Data lacks,
    composed as groupby(user).map_groups over per-user time-sorted
    frames (partitioning assumption: one user's events fit one group —
    holds at any scale where per-user event counts are bounded).
    Timestamps cross the engine boundary as epoch microseconds.
    """
    import pandas as pd

    def sessionize(g: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        # normalize to epoch microseconds regardless of the pandas
        # datetime64 unit the block arrived in (ns vs us)
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gaps = np.diff(us, prepend=us[0] - (gap_s * 1_000_000 + 1))
        session_idx = np.cumsum(gaps > gap_s * 1_000_000) - 1
        out = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(), "session_idx": session_idx, "us": us}
        )
        agg = out.groupby("session_idx", sort=True).agg(
            user_id=("user_id", "first"),
            n_events=("us", "size"),
            start_us=("us", "min"),
            end_us=("us", "max"),
        )
        agg = agg.reset_index()
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].astype("int64"),
                "session_idx": agg["session_idx"].astype("int64"),
                "n_events": agg["n_events"].astype("int64"),
                "start_us": agg["start_us"].astype("int64"),
                "end_us": agg["end_us"].astype("int64"),
            }
        )

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return (
        ds.groupby("user_id")
        .map_groups(sessionize, batch_format="pandas")
        .sort(["user_id", "session_idx"])
    )


def orders_top3_per_customer(sf_dir: str, max_custkey: int = 100) -> ray.data.Dataset:
    """Per-group top-k (rank window): top-3 orders by price for the
    first ``max_custkey`` customers. Filter pushed to the scan batch."""
    import pandas as pd

    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def fil(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["o_custkey"], max_custkey))

    def topk(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(3)
        g = g.copy()
        g["rank"] = range(1, len(g) + 1)
        return g

    return (
        ds.map_batches(fil, batch_format="pyarrow")
        .groupby("o_custkey")
        .map_groups(topk, batch_format="pandas")
        .sort(["o_custkey", "rank"])
    )


def supplier_count_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Supplier count + account-balance cents per nation (broadcast
    lookup after the aggregation, as in customer_revenue_by_nation)."""
    ds = read_table(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    agg = ds.groupby("s_nationkey").aggregate(
        Count(alias_name="n_suppliers"),
        Sum("s_acctbal", alias_name="acctbal_e2"),
    )
    nation = _small_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    nname = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )

    def attach(batch: pa.Table) -> pa.Table:
        names = pa.array(
            [nname.get(kk) for kk in batch["s_nationkey"].to_pylist()],
            type=pa.string(),
        )
        return pa.table(
            {
                "nation_name": names,
                "n_suppliers": batch["n_suppliers"],
                "acctbal_e2": _floor_scaled(batch["acctbal_e2"], 100.0),
            }
        )

    return agg.map_batches(attach, batch_format="pyarrow").sort("nation_name")


def part_filter_like(sf_dir: str, needle: str = "red") -> ray.data.Dataset:
    """String-predicate scan: parts whose name contains ``needle``."""
    ds = read_table(
        sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"]
    )

    def fil(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(batch["p_name"], needle)
        batch = batch.filter(mask)
        return pa.table(
            {
                "p_partkey": batch["p_partkey"],
                "p_name": batch["p_name"],
                "price_e2": _floor_scaled(batch["p_retailprice"], 100.0),
            }
        )

    return ds.map_batches(fil, batch_format="pyarrow")


def events_asof_last_error(sf_dir: str) -> ray.data.Dataset:
    """Per-user AS-OF join (a custom operator Ray Data lacks): for each
    'click' event, attach the timestamp of the most recent PRIOR
    'error' event of the same user (-1 if none).

    Composition: groupby(user_id) co-locates each user's history, the
    per-group kernel sorts by time and resolves the as-of lookup with
    one vectorized searchsorted. Partitioning assumption: one user's
    events fit in one group (bounded per-user history) — the same
    assumption any keyed as-of join makes before falling back to
    time-bucketed range partitioning.
    """
    import pandas as pd

    def asof(g: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        is_err = (g["event_type"] == "error").to_numpy()
        # positional running max of error timestamps, shifted one row —
        # exactly the oracle's ROWS UNBOUNDED PRECEDING AND 1 PRECEDING
        # frame (a same-microsecond earlier ROW counts as prior)
        vals = np.where(is_err, us, np.int64(-1))
        run = np.maximum.accumulate(vals)
        prior = np.concatenate(([np.int64(-1)], run[:-1]))
        is_click = (g["event_type"] == "click").to_numpy()
        clicks = g[is_click]
        return pd.DataFrame(
            {
                "event_id": clicks["event_id"].to_numpy().astype(np.int64),
                "user_id": clicks["user_id"].to_numpy().astype(np.int64),
                "click_us": us[is_click],
                "last_error_us": prior[is_click].astype(np.int64),
            }
        )

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    return (
        ds.groupby("user_id")
        .map_groups(asof, batch_format="pandas")
        .sort(["user_id", "event_id"])
    )


def events_trailing_count(sf_dir: str, window_s: int = 300) -> ray.data.Dataset:
    """Trailing RANGE-frame windowed aggregate: for each 'error' event,
    the number of same-user events in the trailing ``window_s`` seconds
    (inclusive of time-tie peers, exactly SQL's RANGE BETWEEN ...
    PRECEDING AND CURRENT ROW).

    Per-user map_groups with two vectorized ``searchsorted`` calls — no
    per-row loop; same bounded-per-user partitioning assumption as
    ``events_sessionize``.
    """
    import pandas as pd

    win_us = window_s * 1_000_000

    def trailing(g: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # RANGE frame: rows with time in [t - win, t], including peers
        # of the current row that sort after it positionally
        hi = np.searchsorted(us, us, side="right")
        lo = np.searchsorted(us, us - win_us, side="left")
        cnt = (hi - lo).astype(np.int64)
        is_err = (g["event_type"] == "error").to_numpy()
        errs = g[is_err]
        return pd.DataFrame(
            {
                "user_id": errs["user_id"].to_numpy().astype(np.int64),
                "event_id": errs["event_id"].to_numpy().astype(np.int64),
                "err_us": us[is_err],
                "cnt_win": cnt[is_err],
            }
        )

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    return (
        ds.groupby("user_id")
        .map_groups(trailing, batch_format="pandas")
        .sort(["user_id", "event_id"])
    )


def orders_lineitem_range_join(
    sf_dir: str, window_days: int = 30, band_days: int = 32
) -> ray.data.Dataset:
    """Distributed interval (range) join with NO equi-key: for each
    order, the number of lineitems (any order's) whose ship day falls
    in [o_orderdate, o_orderdate + window_days) — the banded range-join
    custom operator Ray Data lacks.

    Physical plan: both sides map their day values onto coarse time
    bands (``band_days`` ≥ ``window_days`` ⇒ an interval overlaps at
    most 2 bands, so interval rows replicate ≤2× and point rows exactly
    1×); a single groupby(band) co-locates each band; the per-band
    kernel sorts the point days once and answers every interval with
    two vectorized ``searchsorted`` calls (O((P+I) log P) per band); a
    final vocabulary-scale groupby(o_orderkey) sums the ≤2 partial
    counts. Only (band, day) and (band, orderkey, start, end) int64
    rows cross the shuffle — never the source tables.
    """
    import numpy as np
    import pandas as pd

    assert band_days >= window_days, "an interval must span ≤ 2 bands"
    _US_PER_DAY = 86_400_000_000

    def points(batch: pa.Table) -> pa.Table:
        # all values positive → integer divide (truncating) == floor
        day = pc.divide(batch["l_shipdate"].cast(pa.int64()), _US_PER_DAY)
        n = len(batch)
        return pa.table(
            {
                "band": pc.divide(day, band_days),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "day": day,
                "o_orderkey": pa.array(np.full(n, -1, dtype=np.int64)),
                "end_day": pa.array(np.full(n, -1, dtype=np.int64)),
            }
        )

    def intervals(batch: pa.Table) -> pa.Table:
        start = (
            batch["o_orderdate"].cast(pa.int64()).to_numpy() // _US_PER_DAY
        )
        end = start + window_days  # exclusive
        okey = batch["o_orderkey"].to_numpy()
        b0 = start // band_days
        b1 = (end - 1) // band_days
        # one row per (interval, band-it-overlaps); b1 == b0 for most
        dup = b1 != b0
        band = np.concatenate([b0, b1[dup]])
        return pa.table(
            {
                "band": pa.array(band, type=pa.int64()),
                "kind": pa.array(np.ones(len(band), dtype=np.int8)),
                "day": pa.array(
                    np.concatenate([start, start[dup]]), type=pa.int64()
                ),
                "o_orderkey": pa.array(
                    np.concatenate([okey, okey[dup]]), type=pa.int64()
                ),
                "end_day": pa.array(
                    np.concatenate([end, end[dup]]), type=pa.int64()
                ),
            }
        )

    def band_kernel(g: "pd.DataFrame") -> "pd.DataFrame":
        band = np.int64(g["band"].iloc[0])
        is_pt = (g["kind"] == 0).to_numpy()
        days = np.sort(g["day"].to_numpy()[is_pt])
        iv = g[~is_pt]
        if len(iv) == 0:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "partial": pd.Series([], dtype="int64"),
                }
            )
        # only count points that belong to THIS band (each point lives
        # in exactly one band, so cross-band double counting is
        # impossible by construction; still clamp for clarity)
        lo_day = np.maximum(iv["day"].to_numpy(), band * band_days)
        hi_day = np.minimum(iv["end_day"].to_numpy(), (band + 1) * band_days)
        cnt = np.searchsorted(days, hi_day, side="left") - np.searchsorted(
            days, lo_day, side="left"
        )
        return pd.DataFrame(
            {
                "o_orderkey": iv["o_orderkey"].to_numpy().astype(np.int64),
                "partial": cnt.astype(np.int64),
            }
        )

    pts = read_table(sf_dir, "lineitem", columns=["l_shipdate"]).map_batches(
        points, batch_format="pyarrow"
    )
    ivs = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(intervals, batch_format="pyarrow")
    return (
        pts.union(ivs)
        .groupby("band")
        .map_groups(band_kernel, batch_format="pandas")
        .groupby("o_orderkey")
        .aggregate(Sum("partial", alias_name="n_shipped"))
        .sort("o_orderkey")
    )
