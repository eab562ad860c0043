"""Stateless extraction + filter stages (the pipeline's narrow front).

- ``extract_text_stage``: html → title/text (drops the html column so
  only narrow blocks flow downstream).
- ``filter_processable``: vectorized lang/nonempty filter — a
  ``pyarrow.compute`` mask inside map_batches, not a per-row
  ``ds.filter`` (reference analog: empty-content skip at
  /root/reference/src/process_and_extract.py:567-569).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.html_text import extract_text_batch


def filter_processable(batch: pa.Table, *, lang: str = "en") -> pa.Table:
    mask = pc.and_(
        pc.equal(batch.column("lang"), pa.scalar(lang)),
        pc.not_equal(batch.column("text"), pa.scalar("")),
    )
    return batch.filter(mask)


def extract_and_filter(pages_ds, *, lang: str = "en", drop_ref: bool = True):
    """pages → (url, warc_ts, lang, title, text) of processable docs."""
    ds = pages_ds.map_batches(extract_text_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda b: filter_processable(b, lang=lang), batch_format="pyarrow"
    )
    if drop_ref:
        ds = ds.map_batches(
            lambda b: b.drop_columns([c for c in ("text_ref",) if c in b.column_names]),
            batch_format="pyarrow",
        )
    return ds
