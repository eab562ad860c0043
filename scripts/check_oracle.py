"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` (when present)
over the same sf dir, sorts columns by name, and compares row counts +
values. Usage: python scripts/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # list/vector columns (e.g. doc_embed.embedding) are unhashable —
    # sort on the scalar columns only; the vector values are pinned by
    # their derived scalar columns (l2norm_e6) and by unit tests
    import numpy as np

    sortable = [
        c
        for c in df.columns
        if len(df) == 0
        or not isinstance(df[c].iloc[0], (list, tuple, np.ndarray))
    ]
    return df.sort_values(sortable or list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(mine)} rows)")
            continue
        theirs = canon(con.execute(oracles[name]).df())
        if len(mine) != len(theirs):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(mine)} vs oracle {len(theirs)}")
            continue
        if list(mine.columns) != list(theirs.columns):
            failures.append(name)
            print(
                f"FAIL  {name}: columns {list(mine.columns)} vs {list(theirs.columns)}"
            )
            continue
        try:
            pd.testing.assert_frame_equal(
                mine, theirs, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
            )
            print(f"OK    {name}: {len(mine)} rows match oracle")
        except AssertionError as exc:
            failures.append(name)
            print(f"FAIL  {name}: value mismatch\n{str(exc)[:800]}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(rc)
