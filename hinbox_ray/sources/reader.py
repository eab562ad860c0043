"""Schema-clean parquet reads.

pandas-written parquet carries a ``b'pandas'`` schema-metadata entry
whose value is a JSON dict; ``pa.Schema.__hash__`` raises on it, so Ray
Data's block-schema dedup logs ``Failed to hash the schemas: unhashable
type: 'dict'`` on every block combine — pure noise that buries real
schema warnings. Passing an explicit, metadata-free, column-pruned
schema to ``read_parquet`` silences it at the source (inside the
ReadParquet operator, where a downstream ``map_batches`` strip can't
reach) and costs nothing: one footer read on the driver.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Sequence, Union

import pyarrow as pa
import ray.data


def _first_parquet_file(path: Union[str, Sequence[str]]) -> str:
    if not isinstance(path, str):
        return _first_parquet_file(path[0])
    if os.path.isdir(path):
        hits = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not hits:
            raise FileNotFoundError(f"no parquet files under {path}")
        return hits[0]
    return path


def clean_schema(
    path: Union[str, Sequence[str]], columns: Optional[List[str]] = None
) -> pa.Schema:
    """Footer schema of ``path``, metadata-free, pruned to ``columns``."""
    import pyarrow.parquet as pq

    sch = pq.read_schema(_first_parquet_file(path))
    fields = [pa.field(f.name, f.type) for f in sch]
    if columns is not None:
        by_name = {f.name: f for f in fields}
        fields = [by_name[c] for c in columns]
    return pa.schema(fields)


def read_parquet_clean(
    path: Union[str, Sequence[str]],
    columns: Optional[List[str]] = None,
    **kwargs,
) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with an explicit metadata-free schema.

    Drop-in replacement for testdata-facing reads; extra kwargs
    (``filter``, ``override_num_blocks``, …) pass through.
    """
    return ray.data.read_parquet(
        path, columns=columns, schema=clean_schema(path, columns), **kwargs
    )


def read_documents_jsonl(
    sf_dir: str,
    columns: Optional[List[str]] = None,
    cache_root: str = "/tmp/graft_jsonl",
) -> ray.data.Dataset:
    """The documents table through a JSONL round-trip — the
    non-parquet source path (S-family source-format breadth).

    Ray writes the table once to sharded JSONL under ``cache_root``
    (distributed ``write_json``, tmp-dir + atomic rename, _SUCCESS
    marker — the same resumable-sink idiom as state/lineage.py), then
    every call streams it back with ``ray.data.read_json``. JSON is
    lossless for int64-range ids and unicode strings, so pipelines over
    this source must hash-match the parquet-reading DuckDB oracle —
    which is exactly what Q:`doc_dedup_exact_jsonl` checks.

    Scale note: JSONL shards stream block-by-block like parquet but
    carry no column pruning or row-group statistics — ``columns`` here
    prunes AFTER decode. The parquet path stays the recommended format;
    this source exists for ingest parity with JSONL-native corpora
    (Common-Crawl-style dumps).
    """
    import shutil

    base = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(cache_root, base)
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet")
        ).write_json(tmp)
        shutil.rmtree(out, ignore_errors=True)
        os.replace(tmp, out)
        with open(marker, "w"):
            pass
    ds = ray.data.read_json(
        out, file_extensions=["json"]
    )
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def read_documents_csv(
    sf_dir: str,
    columns: Optional[List[str]] = None,
    cache_root: str = "/tmp/graft_csv",
) -> ray.data.Dataset:
    """The documents table through a sharded-CSV round-trip — the third
    source format beside parquet and JSONL. Same atomic write-once /
    stream-back idiom as ``read_documents_jsonl``; the Arrow CSV
    reader is configured with ``newlines_in_values`` so quoted
    multi-line text fields survive byte-exactly (the property
    Q:`doc_dedup_exact_csv` hash-checks against the parquet oracle).

    Scale note: CSV is the worst of the three formats at scale — no
    column pruning, no statistics, and quoting forces a serial scan
    within each shard; it exists for ingest parity with CSV-native
    corpora. Parquet remains the recommended format.
    """
    import shutil

    from pyarrow import csv as pacsv

    base = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(cache_root, base)
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet")
        ).write_csv(tmp)
        shutil.rmtree(out, ignore_errors=True)
        os.replace(tmp, out)
        with open(marker, "w"):
            pass
    ds = ray.data.read_csv(
        out,
        file_extensions=["csv"],
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        # Arrow's quoted_strings_can_be_null default is True, so a
        # shard whose text values are all "" infers as a null column
        # (empty text comes back None); both flags off keep "" as ""
        convert_options=pacsv.ConvertOptions(
            strings_can_be_null=False, quoted_strings_can_be_null=False
        ),
    )
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
