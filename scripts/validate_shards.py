#!/usr/bin/env python
"""Audit a sharded sorted-triples output (``triples/shard=N/`` hive
layout written by ``resolve_from_checkpoint(sort_triples="sharded")`` or
``python -m hinbox_ray --sharded-triples``).

Checks, per shard (round-3 VERDICT #8 — the audit a multi-node operator
runs after a resumed run before trusting the output):

1. **sorted**: rows are non-decreasing by (subj, pred, obj);
2. **distinct**: no adjacent duplicate triple (sorted ⇒ global within
   the shard);
3. **assignment**: every subj hashes to exactly this shard
   (``hash_pandas_object(subj) % num_shards == N`` — the same function
   ``sharded_sorted_triples`` partitions with). Deterministic assignment
   implies CROSS-SHARD DISJOINTNESS: no subject can appear in two
   shards, so the shards are independently consumable range files and a
   resume that re-wrote a subset of shards cannot have duplicated or
   split a subject across shards.

Prints one JSON line and exits non-zero on any violation. Pure
pyarrow/pandas — shards are vocabulary-scale, so a driver-side loop is
the right tool; no Ray session required.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def validate_shard_dir(triples_dir: str, num_shards: int = 64) -> dict:
    """Validate every ``shard=N`` partition under ``triples_dir``.

    Returns ``{"ok": bool, "shards": int, "rows": int, "errors": [...]}``
    (importable — the test drives this function directly)."""
    errors: List[str] = []
    shard_dirs = sorted(
        d for d in os.listdir(triples_dir) if d.startswith("shard=")
    )
    if not shard_dirs:
        return {
            "ok": False,
            "shards": 0,
            "rows": 0,
            "errors": [f"no shard= partitions under {triples_dir}"],
        }
    total_rows = 0
    for d in shard_dirs:
        shard_no = int(d.split("=", 1)[1])
        files = sorted(
            os.path.join(triples_dir, d, f)
            for f in os.listdir(os.path.join(triples_dir, d))
            if f.endswith(".parquet")
        )
        if not files:
            errors.append(f"{d}: empty partition directory")
            continue
        df = pd.concat(
            [pq.read_table(f).to_pandas() for f in files], ignore_index=True
        )
        total_rows += len(df)
        if df.empty:
            continue
        key = list(zip(df["subj"], df["pred"], df["obj"]))
        if any(key[i] > key[i + 1] for i in range(len(key) - 1)):
            errors.append(f"{d}: rows not sorted by (subj, pred, obj)")
        if any(key[i] == key[i + 1] for i in range(len(key) - 1)):
            errors.append(f"{d}: duplicate adjacent triple")
        assigned = (
            pd.util.hash_pandas_object(df["subj"], index=False).to_numpy()
            % num_shards
        ).astype(np.int64)
        if not (assigned == shard_no).all():
            bad = df["subj"][assigned != shard_no].iloc[0]
            errors.append(
                f"{d}: subj {bad!r} hashes to shard "
                f"{int(assigned[(assigned != shard_no).argmax()])}, "
                f"violating hash-range disjointness"
            )
    return {
        "ok": not errors,
        "shards": len(shard_dirs),
        "rows": total_rows,
        "errors": errors,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("triples_dir", help="path to the triples/ hive dir")
    ap.add_argument(
        "--num-shards",
        type=int,
        default=64,
        help="shard count the writer used (sharded_sorted_triples default)",
    )
    args = ap.parse_args()
    report = validate_shard_dir(args.triples_dir, args.num_shards)
    print(json.dumps(report, sort_keys=True))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
