"""Deterministic synthetic Common-Crawl-style `pages` table.

Produces the north-rule input schema
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``
as a pure function of ``doc_id`` (splitmix64 chains — no RNG state, no
wall clock), so any scale tier regenerates identically on every node.

- ``html`` is rendered from one of 8 template branches (FIXTURES.md §1.1)
  that together exercise every branch of the reference extractor
  (/root/reference/scripts/get_miami_herald_articles.py:219-249):
  container fallback chain, Advertisement-paragraph dropping, the
  no-<p> ``get_text`` fallback, missing container, unicode/entities.
- ``text`` is computed by running the engine's extractor over ``html``
  at generation time, so the column doubles as the byte-identical
  oracle; independent hand-written expected strings live in
  tests/test_html_text.py.
- Bodies carry planted gazetteer mention sentences with Zipf-like
  frequencies (hot-key skew: the "United States" group appears in ~10%
  of documents) plus filler sentences, optionally seeded from the
  driver's ``documents.parquet`` text.

Used three ways:
- ``pages_dataset(sf_dir)``: Dataset pipeline — read documents.parquet
  (column-pruned) → ``map_batches(synthesize_pages_batch)``. This is the
  input to ``queries()['kg_triples']`` and bench.py.
- ``generate_pages_table(n)``: small in-memory pyarrow Table for tests.
- ``write_pages_parquet(...)``: materialize a corpus dir for resume tests.
"""

from __future__ import annotations

import html as html_mod
from typing import Dict, Iterator, List, Optional

import numpy as np
import pyarrow as pa

from ..config import GAZETTEER, GazEntry
from ..functions.hashing import splitmix64
from ..functions.html_text import extract_article

_SEED = np.uint64(0x5EED_C0DE_2026)
_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds

# Weighted gazetteer sampling tables (deterministic, module-level).
_WEIGHTS = np.array([e.weight for e in GAZETTEER], dtype=np.float64)
_CUM = np.cumsum(_WEIGHTS) / _WEIGHTS.sum()

_FILLER = [
    "Officials declined to comment on the pending review.",
    "The documents were released after a lengthy court battle.",
    "Conditions at the facility have drawn international scrutiny.",
    "Lawyers for the men said the process lacked transparency.",
    "A spokesman said the timeline remains under discussion.",
    "The transfer was confirmed in a statement late Friday.",
    "Records show the review began earlier than disclosed.",
    "Advocates called for an independent investigation.",
]

_SENTENCE_FORMS = [
    "{a} was named in newly released filings.",
    "According to the report, {a} met with investigators at {b}.",
    "{a} described the hearing as unprecedented.",
    "Witnesses placed {a} near {b} during the review.",
    "The filing cites {a} and references {b} repeatedly.",
    "{a} issued a statement following the decision.",
]


def _stream(doc_id: int) -> Iterator[int]:
    """Infinite deterministic 64-bit stream seeded by doc_id."""
    x = np.uint64(doc_id) ^ _SEED
    while True:
        x = splitmix64(np.array([x], dtype=np.uint64))[0]
        yield int(x)


def _pick_entry(rnd: int) -> GazEntry:
    u = (rnd >> 11) / float(1 << 53)  # uniform [0,1)
    idx = int(np.searchsorted(_CUM, u, side="right"))
    return GAZETTEER[min(idx, len(GAZETTEER) - 1)]


def _surface_text(entry: GazEntry) -> str:
    """Plantable surface. Events carry their start_date inline ("<title>
    on YYYY-MM-DD") so the stub extractor can recover the (title, date)
    key from text alone — the reference gets the date from its LLM."""
    if entry.entity_type == "events" and entry.attrs.get("start_date"):
        return f"{entry.surface} on {entry.attrs['start_date']}"
    return entry.surface


def _mention_sentences(doc_id: int, rs: Iterator[int]) -> List[str]:
    k = 1 + next(rs) % 4  # 1-4 mention sentences per doc
    sentences = []
    for _ in range(k):
        form = _SENTENCE_FORMS[next(rs) % len(_SENTENCE_FORMS)]
        a = _surface_text(_pick_entry(next(rs)))
        b = _surface_text(_pick_entry(next(rs)))
        sentences.append(form.format(a=a, b=b))
    return sentences


def _body_paragraphs(
    doc_id: int, rs: Iterator[int], filler_text: Optional[str]
) -> List[str]:
    """Mention sentences interleaved with filler, 3-6 paragraphs."""
    mentions = _mention_sentences(doc_id, rs)
    fillers = list(_FILLER)
    if filler_text:
        # borrow a couple of sentences from the driver-provided document text
        chunks = [c.strip() for c in filler_text.split(".") if len(c.strip()) > 20]
        fillers.extend(chunks[:4])
    paras: List[str] = []
    n_paras = 3 + next(rs) % 4
    mi = 0
    for _ in range(n_paras):
        parts = []
        if mi < len(mentions) and next(rs) % 3 != 0:
            parts.append(mentions[mi])
            mi += 1
        parts.append(fillers[next(rs) % len(fillers)])
        paras.append(" ".join(parts))
    # ensure every mention sentence lands in some paragraph
    while mi < len(mentions):
        paras.append(mentions[mi])
        mi += 1
    return paras


def _esc(s: str) -> str:
    return html_mod.escape(s, quote=False)


def _render_html(doc_id: int, title: str, paras: List[str], rs: Iterator[int]) -> str:
    """Render one of 8 template branches chosen by doc_id % 8."""
    branch = doc_id % 8
    ps = "\n".join(f"<p>{_esc(p)}</p>" for p in paras)
    head = f"<html><head><title>t{doc_id}</title></head><body>"
    tail = "</body></html>"
    h1 = f"<h1>{_esc(title)}</h1>"

    if branch == 0:  # T1: <article> with <p>
        return f"{head}{h1}<article>{ps}</article>{tail}"
    if branch == 1:  # T2: div.article-body fallback
        return f'{head}{h1}<div class="article-body">{ps}</div>{tail}'
    if branch == 2:  # T3: <main> fallback
        return f"{head}{h1}<main>{ps}</main>{tail}"
    if branch == 3:  # T4: div.container fallback
        return f'{head}{h1}<div class="container">{ps}</div>{tail}'
    if branch == 4:  # T5: no recognized container → empty text
        return f"{head}{h1}<section>{ps}</section>{tail}"
    if branch == 5:  # T6: Advertisement paragraphs must be dropped
        ads = "<p>Advertisement</p><p>Advertisement — subscribe today</p>"
        return f"{head}{h1}<article>{ads}{ps}<p>Advertisement</p></article>{tail}"
    if branch == 6:  # T7: container without <p> → get_text fallback
        joined = "<br>".join(_esc(p) for p in paras)
        return f"{head}{h1}<main><span>{joined}</span></main>{tail}"
    # T8: unicode, entities, nested tags, empty <p>, header-only title
    nested = (
        f"<p><strong>{_esc(paras[0][:40])}</strong>{_esc(paras[0][40:])}</p>"
        if paras
        else ""
    )
    rest = "\n".join(f"<p>{_esc(p)}</p>" for p in paras[1:])
    return (
        f"{head}<header>{_esc(title)} — détail &amp; résumé</header>"
        f"<article><p></p>{nested}{rest}<p>Café &eacute;toilé.</p></article>{tail}"
    )


def synthesize_page(doc_id: int, filler_text: Optional[str] = None) -> Dict:
    """One page row (pure function of doc_id [+ optional filler text])."""
    rs = _stream(doc_id)
    lead = _pick_entry(next(rs)).surface
    title = f"Report {doc_id}: {lead} under review"
    paras = _body_paragraphs(doc_id, rs, filler_text)
    html = _render_html(doc_id, title, paras, rs)
    _, text = extract_article(html)

    lang_roll = next(rs) % 20
    lang = "en" if lang_roll > 1 else ("de", "es")[lang_roll]

    return {
        "url": f"https://example.org/crawl/{doc_id:010d}",
        # +9973s per doc, wrapped at ~10 years so arbitrarily large
        # bench doc_ids (repeat-shifted by 10M) stay in timestamp range
        "warc_ts": _EPOCH_US + (doc_id * 9_973_000_000) % 315_360_000_000_000,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _rows_to_table(rows: List[Dict]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], type=pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in rows], type=pa.binary()),
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=PAGES_SCHEMA,
    )


def generate_pages_table(n: int, start: int = 0) -> pa.Table:
    """Small in-memory pages table for tests (doc_ids start..start+n)."""
    return _rows_to_table([synthesize_page(i) for i in range(start, start + n)])


def synthesize_pages_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: documents(doc_id, text) → pages rows."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = (
        batch.column("text").to_pylist()
        if "text" in batch.column_names
        else [None] * len(doc_ids)
    )
    return _rows_to_table(
        [synthesize_page(int(d), t) for d, t in zip(doc_ids, texts)]
    )


def pages_dataset(sf_dir: str, repeat: int = 1, num_blocks: int = 32):
    """Pages Dataset derived from ``{sf_dir}/documents.parquet``.

    Column-pruned read (doc_id, text only) → stateless map_batches
    synthesis. ``repeat`` > 1 unions shifted copies for bench-scale runs
    (doc_ids offset by 10M per copy so urls stay unique).

    ``num_blocks`` splits the single-file read so the fused
    synthesize→extract→mention chain parallelizes across the pool (a
    one-block read would serialize the whole front of the pipeline; at
    production scale the input is many files and this is a no-op).
    """
    from .reader import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=num_blocks,
    )
    if repeat == 1:
        return ds.map_batches(synthesize_pages_batch, batch_format="pyarrow")

    # expand the copies INSIDE one map stage (each batch synthesizes all
    # `repeat` shifted copies of its rows): a union of `repeat` read
    # branches makes repeat×num_blocks tiny blocks whose per-task
    # overhead grows superlinearly — one read, one stage instead
    def synth_repeated(batch: pa.Table, _r=repeat) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for r in range(_r):
            shifted = batch.set_column(
                batch.schema.get_field_index("doc_id"),
                "doc_id",
                pc.add(batch.column("doc_id"), 10_000_000 * r),
            )
            parts.append(synthesize_pages_batch(shifted))
        return pa.concat_tables(parts)

    # bound the OUTPUT block size: each input row becomes `repeat` pages
    return ds.map_batches(
        synth_repeated,
        batch_format="pyarrow",
        batch_size=max(4, 4096 // repeat),
    )


def write_pages_parquet(out_dir: str, n: int, num_shards: int = 8) -> List[str]:
    """Materialize a small deterministic corpus as `num_shards` parquet
    files (one per contiguous doc_id range) — the layout the resumable
    extraction stage treats as input partitions."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n + num_shards - 1) // num_shards
    for s in range(num_shards):
        lo, hi = s * per, min((s + 1) * per, n)
        if lo >= hi:
            break
        path = os.path.join(out_dir, f"pages-{s:05d}.parquet")
        pq.write_table(generate_pages_table(hi - lo, start=lo), path)
        paths.append(path)
    return paths
