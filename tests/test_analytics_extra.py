"""Targeted tests for the round-2 analytics operators that the oracle
parametrization can't fully pin (sketch accuracy, index conventions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def test_hll_matches_exact_within_3_sigma(ray_session):
    import duckdb

    from hinbox_ray.pipelines.analytics import events_hll_users

    est = int(events_hll_users(SF).to_pandas()["n_users_est"].iloc[0])
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    # p=14 → σ ≈ 1.04/√16384 ≈ 0.81%; allow 3σ
    assert abs(est - exact) / exact < 0.025, (est, exact)


def test_hll_is_deterministic(ray_session):
    from hinbox_ray.pipelines.analytics import events_hll_users

    a = int(events_hll_users(SF).to_pandas()["n_users_est"].iloc[0])
    b = int(events_hll_users(SF).to_pandas()["n_users_est"].iloc[0])
    assert a == b


def test_hll_linear_counting_ln_parity():
    """The one float op in the HLL estimate is linear counting's
    m·ln(m/V). Its reachable domain is exactly V ∈ [1, m]: sweep ALL of
    it and assert numpy and DuckDB agree after quantization — this is
    what licenses the events_hll_users oracle to use `ln`."""
    import duckdb
    import numpy as np

    m = 1 << 14
    v = np.arange(1, m + 1, dtype=np.float64)
    py = np.floor(m * np.log(m / v) + 0.5).astype(np.int64)
    got = duckdb.sql(
        f"SELECT CAST(floor({m}*ln({m}.0/v)+0.5) AS BIGINT) AS e"
        f" FROM range(1,{m + 1}) t(v) ORDER BY v"
    ).fetchnumpy()["e"].astype(np.int64)
    assert (py == got).all()


def test_hll_bias_corrected_branch_matches_sql(ray_session, tmp_path):
    """High-cardinality corpus → the integer floor-division branch; the
    engine and the SQL must agree bit-for-bit there too (the driver's
    sf corpora only exercise linear counting)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hinbox_ray.pipelines.analytics import (
        events_hll_users,
        events_hll_users_sql,
    )

    ids = np.arange(200_000, dtype=np.int64) * 7919 + 13
    pq.write_table(pa.table({"user_id": ids}), str(tmp_path / "events.parquet"))
    eng = int(events_hll_users(str(tmp_path)).to_pandas()["n_users_est"].iloc[0])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    got = con.execute(events_hll_users_sql()).fetchone()[0]
    assert eng == got
    assert abs(eng - 200_000) / 200_000 < 0.025


def test_quantile_disc_convention(ray_session, tmp_path):
    """orders_price_quantiles must use DuckDB's quantile_disc index
    (sorted ascending, element at ceil(q*n)-1) — pinned on a table
    small enough to enumerate, with values straddling bucket edges."""
    import duckdb

    from hinbox_ray.pipelines.analytics import orders_price_quantiles

    vals = [1.0, 63.9, 64.0, 64.1, 100.0, 128.0, 1000.5, 2000.25, 5.5, 70.0]
    n = len(vals)
    tbl = pa.table(
        {
            "o_orderkey": pa.array(range(n), type=pa.int64()),
            "o_custkey": pa.array([1] * n, type=pa.int64()),
            "o_orderstatus": pa.array(["O"] * n),
            "o_totalprice": pa.array(vals, type=pa.float64()),
            "o_orderdate": pa.array([0] * n, type=pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    mine = (
        orders_price_quantiles(str(tmp_path))
        .to_pandas()
        .set_index("pct")["price"]
    )
    for q in (0.25, 0.5, 0.75, 0.95):
        want = duckdb.sql(
            f"SELECT quantile_disc(o_totalprice, {q}) "
            f"FROM '{tmp_path}/orders.parquet'"
        ).fetchone()[0]
        assert mine[int(q * 100)] == want, (q, mine[int(q * 100)], want)


def test_hourly_gapfill_dense_and_exact(ray_session):
    """events_hourly_gapfill: every type covers its full hour range
    with NO missing hours, zero-fills are present (the densification
    is non-vacuous), and the non-zero counts match a pandas resample."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from hinbox_ray.pipelines.analytics import events_hourly_gapfill

    SF = "/root/testdata/sf0.001"
    got = events_hourly_gapfill(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["hour"] = ev["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:00:00")
    truth = ev.groupby(["event_type", "hour"]).size()
    assert (got["n_events"] == 0).any()  # gaps actually filled
    for et, grp in got.groupby("event_type"):
        hours = pd.to_datetime(grp["hour"])
        # dense: consecutive hours, no holes
        assert (hours.diff().dropna() == pd.Timedelta(hours=1)).all()
        sub = ev[ev["event_type"] == et]
        assert hours.min() == sub["ts"].min().floor("h")
        assert hours.max() == sub["ts"].max().floor("h")
    for r in got.itertuples():
        assert r.n_events == truth.get((r.event_type, r.hour), 0)
    assert int(got["n_events"].sum()) == len(ev)  # mass conserved


def test_daily_pivot_matches_crosstab(ray_session):
    """events_daily_pivot vs a pandas crosstab — wide counts per day."""
    import pandas as pd
    import pyarrow.parquet as pq

    from hinbox_ray.pipelines.analytics import EVENT_TYPES, events_daily_pivot

    SF = "/root/testdata/sf0.001"
    got = events_daily_pivot(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    ct = pd.crosstab(ev["day"], ev["event_type"])
    assert len(got) == ct.shape[0]
    assert sorted(EVENT_TYPES) == sorted(ct.columns)
    got = got.set_index("day")
    for t in EVENT_TYPES:
        assert (got[f"n_{t}"] == ct[t].reindex(got.index).fillna(0)).all()
    assert int(got.to_numpy().sum()) == len(ev)  # mass conserved


def test_interarrival_matches_pandas_lag(ray_session):
    import pyarrow.parquet as pq

    from hinbox_ray.pipelines.analytics import events_interarrival

    SF = "/root/testdata/sf0.001"
    got = events_interarrival(SF).to_pandas()
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).to_pandas()
    ev = ev.sort_values(["ts", "event_id"])
    # integer microseconds end to end — a float total_seconds() loses
    # a µs on ~1e10-µs deltas
    assert str(ev["ts"].dtype) == "datetime64[us]"
    ev["ts_us"] = ev["ts"].astype("int64")
    ev["delta"] = (
        ev.groupby("user_id")["ts_us"].diff().fillna(-1).astype("int64")
    )
    truth = dict(zip(ev["event_id"], ev["delta"]))
    assert len(got) == len(ev)
    assert (got["delta_us"] == -1).sum() == ev["user_id"].nunique()
    for r in got.itertuples():
        assert r.delta_us == truth[r.event_id], r.event_id


def test_sliding_window_matches_pandas_expansion(ray_session):
    """Hopping windows vs a brute-force pandas expansion: every event
    appears in exactly width/step = 3 windows (mass conservation at
    3x), per-window counts and distinct users match, and overlap is
    real (some user is counted in two overlapping windows)."""
    from hinbox_ray.pipelines.analytics import events_sliding_window

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "event_type", "user_id"]
    ).to_pandas()
    k = (ev["ts"].astype("int64") // 7_200_000_000).to_numpy()
    rows = []
    for j in range(3):
        rows.append(
            pd.DataFrame(
                {
                    "wstep": k - j,
                    "event_type": ev["event_type"].to_numpy(),
                    "user_id": ev["user_id"].to_numpy(),
                }
            )
        )
    exp = pd.concat(rows, ignore_index=True)
    want = (
        exp.groupby(["wstep", "event_type"])
        .agg(n_events=("user_id", "size"), n_users=("user_id", "nunique"))
        .reset_index()
    )
    want["window_start"] = pd.to_datetime(
        want["wstep"] * 7200, unit="s"
    ).dt.strftime("%Y-%m-%d %H:%M:%S")

    got = events_sliding_window(SF).to_pandas()
    assert int(got["n_events"].sum()) == 3 * len(ev)  # 3x mass
    merged = got.merge(
        want, on=["window_start", "event_type"], how="outer", indicator=True
    )
    assert (merged["_merge"] == "both").all()
    assert (merged["n_events_x"] == merged["n_events_y"]).all()
    assert (merged["n_users_x"] == merged["n_users_y"]).all()
    # overlap is non-vacuous: distinct-user sum over windows exceeds
    # what disjoint windows could give (some user double-counted)
    tumbling = exp[exp["wstep"] % 3 == 0]
    assert int(got["n_users"].sum()) > tumbling["user_id"].nunique()


def test_running_total_matches_pandas_cumsum(ray_session):
    """events_running_total vs a pandas groupby cumsum over the same
    integer cents — pins the (ts, event_id) ordering and that the
    final ordinal per user equals the user's event count."""
    from hinbox_ray.pipelines.analytics import events_running_total

    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    ).to_pandas()
    ev["value_e2"] = np.floor(ev["value"] * 100 + 0.5).astype(np.int64)
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["run_sum_e2"] = ev.groupby("user_id")["value_e2"].cumsum()
    ev["run_n"] = ev.groupby("user_id").cumcount() + 1

    got = events_running_total(SF).to_pandas()
    want = ev.sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert (got["run_sum_e2"].to_numpy() == want["run_sum_e2"].to_numpy()).all()
    assert (got["run_n"].to_numpy() == want["run_n"].to_numpy()).all()
    per_user_last = got.groupby("user_id")["run_n"].max()
    counts = ev.groupby("user_id").size()
    assert per_user_last.sort_index().tolist() == counts.sort_index().tolist()
