"""Hyperlink extraction + host-graph / clustering-coefficient ops.

The href tokenizer is pinned on quoting/entity/malformed-markup edge
cases; the two planted-graph ops are pinned against brute-force pure-
Python recomputations independent of the Ray kernels.
"""

from __future__ import annotations

import collections

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as E
from hinbox_ray.functions.links import extract_hrefs, url_host
from hinbox_ray.sources.planted import (
    _N_HOSTS,
    hostgraph_oracle_sql,
    link_targets,
    linked_pages_batch,
)

SF = "/root/testdata/sf0.001"


# ── href tokenizer ──


def test_extract_hrefs_quoting_and_entities():
    html = (
        '<p><a href="http://a.example/x?p=1&amp;q=2">one</a>'
        "<a href='http://b.example/y'>two</a>"
        "<a href=http://c.example/z>three</a></p>"
    )
    assert extract_hrefs(html) == [
        "http://a.example/x?p=1&q=2",  # entity decoded
        "http://b.example/y",
        "http://c.example/z",  # unquoted attribute value
    ]


def test_extract_hrefs_edge_cases():
    # no-href anchors, valueless href, duplicate attribute (first wins),
    # uppercase tag/attr names, bytes input, non-anchor hrefs ignored
    html = (
        b"<a name='x'>skip</a><a href>skip</a>"
        b'<A HREF="http://up.example/">u</A>'
        b'<a href="http://d1.example" href="http://d2.example">d</a>'
        b'<link href="http://not-an-anchor.example">'
        b"<a href=\"http://tail.example\">t"  # unclosed at EOF
    )
    assert extract_hrefs(html) == [
        "http://up.example/",
        "http://d1.example",
        "http://tail.example",
    ]


def test_extract_hrefs_keeps_duplicates_in_order():
    html = '<a href="http://a.example/1"></a><a href="http://a.example/1"></a>'
    assert extract_hrefs(html) == ["http://a.example/1"] * 2


def test_url_host():
    assert url_host("http://H7.Example/p/3?q#f") == "h7.example"
    assert url_host("https://x.example:8080/p") == "x.example"
    assert url_host("mailto:a@b.example") is None
    assert url_host("/relative/path") is None
    assert url_host("javascript:void(0)") is None
    assert url_host("http:///nohost") is None


# ── planted linked corpus ──


def _doc_ids():
    con = duckdb.connect()
    ids = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM '{SF}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    con.close()
    return ids


def test_linked_pages_anchors_match_plan():
    import pyarrow as pa

    ids = _doc_ids()
    n = len(ids)
    batch = pa.table({"doc_id": pa.array(ids[:20], type=pa.int64())})
    out = linked_pages_batch(batch, n_docs=n)
    for d, html in zip(ids[:20], out.column("html").to_pylist()):
        got = [url_host(h) for h in extract_hrefs(html)]
        want = [f"h{t % _N_HOSTS}.example" for t in link_targets(d, n)]
        assert got == want


def _brute_hostgraph(ids):
    n = len(ids)
    cnt: collections.Counter = collections.Counter()
    for d in ids:
        src = f"h{d % _N_HOSTS}.example"
        for t in link_targets(d, n):
            cnt[(src, f"h{t % _N_HOSTS}.example")] += 1
    return cnt


def test_hostgraph_matches_bruteforce(ray_session):
    got = E.queries()["kg_hostgraph_planted"](SF).to_pandas()
    want = _brute_hostgraph(_doc_ids())
    got_map = {
        (r.src_host, r.dst_host): r.n_links for r in got.itertuples()
    }
    assert got_map == dict(want)
    # sorted output, int64 weights, some weight > 1 (dup links counted)
    assert got[["src_host", "dst_host"]].values.tolist() == sorted(
        got[["src_host", "dst_host"]].values.tolist()
    )
    assert got["n_links"].dtype.kind == "i"
    assert int(got["n_links"].max()) >= 1


def test_hostgraph_oracle_sql_matches_bruteforce():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = {
        (a, b): c
        for a, b, c in con.execute(hostgraph_oracle_sql()).fetchall()
    }
    con.close()
    assert sql == dict(_brute_hostgraph(_doc_ids()))


# ── clustering coefficient ──


def test_clustcoef_matches_bruteforce(ray_session):
    com = E.queries()["kg_comention_planted"](SF).to_pandas()
    strong = com[com["n_docs"] >= 4]
    adj: dict = collections.defaultdict(set)
    for r in strong.itertuples():
        adj[r.ea].add(r.eb)
        adj[r.eb].add(r.ea)

    got = E.queries()["kg_clustcoef_planted"](SF).to_pandas()
    assert list(got.columns) == ["subj", "deg", "n_triangles", "clustcoef_e6"]
    assert sorted(got["subj"]) == sorted(adj)
    for r in got.itertuples():
        nbrs = adj[r.subj]
        deg = len(nbrs)
        ntri = sum(
            1
            for u in nbrs
            for v in nbrs
            if u < v and v in adj[u]
        )
        cc = (2_000_000 * ntri) // (deg * (deg - 1)) if deg >= 2 else 0
        assert (r.deg, r.n_triangles, r.clustcoef_e6) == (deg, ntri, cc), r.subj
    # non-vacuous: the planted strong graph has both open and closed
    # neighborhoods
    assert got["clustcoef_e6"].nunique() > 1
    assert int(got["n_triangles"].sum()) > 0


# ── anchor-text alias mining ──


def test_extract_anchors_text_scoping():
    from hinbox_ray.functions.links import extract_anchors

    html = (
        '<a href="http://a.example">Foo &amp; Bar</a>'
        '<a href="http://b.example">x<b>y</b>z</a>'
        "outside"
        '<a href="http://c.example">open<a href="http://d.example">nest</a>'
        '<a name="q">skip</a>'
        '<a href="http://e.example">tail'  # unclosed at EOF
    )
    assert extract_anchors(html) == [
        ("http://a.example", "Foo & Bar"),  # entity decoded
        ("http://b.example", "xyz"),  # nested non-anchor markup
        ("http://c.example", "open"),  # implicit close at new <a>
        ("http://d.example", "nest"),
        ("http://e.example", "tail"),  # EOF flush
    ]


def _brute_aliases(ids):
    from hinbox_ray.sources.planted import anchor_alias_texts

    n = len(ids)
    cnt: collections.Counter = collections.Counter()
    for d in ids:
        ts = link_targets(d, n)
        for t, a in zip(ts, anchor_alias_texts(d, len(ts))):
            cnt[(a, f"h{t % _N_HOSTS}.example")] += 1
    return cnt


def test_anchor_alias_matches_bruteforce(ray_session):
    got = E.queries()["kg_anchor_alias_planted"](SF).to_pandas()
    want = _brute_aliases(_doc_ids())
    got_map = {(r.alias, r.dst_host): r.n_links for r in got.itertuples()}
    assert got_map == dict(want)
    # alias strings are real gazetteer displays (incl. an &-escaped one
    # surviving the round-trip) and weights are int64
    assert got["n_links"].dtype.kind == "i"
    assert got["alias"].str.len().min() > 0


# ── URL canonicalization ──


def test_canonical_url_rules():
    from hinbox_ray.functions.links import canonical_url as c

    assert c("HTTP://H7.Example/p/00000003") == "http://h7.example/p/00000003"
    assert c("http://h7.example:80/p/3") == "http://h7.example/p/3"
    assert c("https://h7.example:443/") == "https://h7.example/"
    assert c("https://h7.example:8443/x") == "https://h7.example:8443/x"
    assert c("http://h7.example/p/3/") == "http://h7.example/p/3"
    assert c("http://h7.example/p/3?utm_source=f&utm_medium=r") == (
        "http://h7.example/p/3"
    )
    assert c("http://h7.example/p/3?a=1&utm_x=2&b=3") == (
        "http://h7.example/p/3?a=1&b=3"
    )
    assert c("http://h7.example/p/3#frag") == "http://h7.example/p/3"
    assert c("http://h7.example") == "http://h7.example/"
    assert c("ftp://x.example/a") is None
    assert c("not a url") is None


def test_url_canonicalize_matches_bruteforce(ray_session):
    from hinbox_ray.functions.links import canonical_url
    from hinbox_ray.sources.planted import md5_lower64, messy_url

    ids = _doc_ids()
    n = len(ids)
    agg: dict = {}
    variants: set = set()
    for d in ids:
        c = canonical_url(messy_url(d, n))
        variants.add(md5_lower64(f"uv:{d}") % 6)
        cnt, keeper = agg.get(c, (0, 1 << 62))
        agg[c] = (cnt + 1, min(keeper, d))
    assert variants == set(range(6))  # every variant class planted

    got = E.queries()["pages_url_canonicalize"](SF).to_pandas()
    got_map = {
        r.canon_url: (r.n_pages, r.keeper_doc_id) for r in got.itertuples()
    }
    assert got_map == agg
    assert int(got["n_pages"].max()) > 1  # dedup is non-vacuous
    assert list(got["canon_url"]) == sorted(got["canon_url"])


# ── weighted host PageRank ──


def test_hostrank_matches_bruteforce(ray_session):
    """Independent dense integer-PR loop over the brute-force host
    graph — same floor arithmetic, no shared code with the Ray kernel
    or the SQL oracle."""
    SCALE = 10**12
    edges = _brute_hostgraph(_doc_ids())
    nodes = sorted({k[0] for k in edges} | {k[1] for k in edges})
    outw = collections.Counter()
    for (src, _dst), w in edges.items():
        outw[src] += w
    n = len(nodes)
    r0 = SCALE // n
    tele = (150 * r0) // 1000
    rank = {v: r0 for v in nodes}
    for _ in range(3):
        s: dict = {v: 0 for v in nodes}
        for (src, dst), w in edges.items():
            if outw[src] > 0:
                s[dst] += w * (rank[src] // outw[src])
        rank = {v: tele + (850 * s[v]) // 1000 for v in nodes}

    got = E.queries()["kg_hostrank_planted"](SF).to_pandas()
    assert {r.host: r.hostrank_e12 for r in got.itertuples()} == rank
    # non-vacuous: authority actually differentiates hosts
    assert got["hostrank_e12"].nunique() > 1


# ── incremental KG maintenance ──


def test_kg_increment_set_algebra(ray_session):
    """Applying the signed diff to the base triple set must reproduce
    the full set exactly — base derived independently via DuckDB."""
    from hinbox_ray.sources.planted import triples_oracle_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    base = {
        tuple(r)
        for r in con.execute(triples_oracle_sql("doc_id >= 20")).fetchall()
    }
    con.close()

    full = {
        (r.subj, r.pred, r.obj)
        for r in E.queries()["kg_triples_planted"](SF)
        .to_pandas()
        .itertuples()
    }
    diff = E.queries()["kg_increment_planted"](SF).to_pandas()
    plus = {
        (r.subj, r.pred, r.obj)
        for r in diff[diff["delta"] == "+"].itertuples()
    }
    minus = {
        (r.subj, r.pred, r.obj)
        for r in diff[diff["delta"] == "-"].itertuples()
    }
    # both branches non-vacuous: the backfill re-elects a canonical name
    assert plus and minus
    assert plus.isdisjoint(base) and minus <= base and plus <= full
    assert (base | plus) - minus == full


# ── kernel robustness ──


def test_canonical_url_idempotent():
    """Canonicalization is a projection: applying it twice = once (the
    property that makes canonical URLs safe as dedup keys)."""
    from hinbox_ray.functions.links import canonical_url

    from hypothesis import given, settings, strategies as st

    host = st.from_regex(r"[a-zA-Z0-9.\-]{1,20}", fullmatch=True)
    path = st.from_regex(r"(/[a-zA-Z0-9._\-]{0,8}){0,4}/?", fullmatch=True)
    query = st.from_regex(
        r"(\?[a-zA-Z0-9_]{1,8}=[a-zA-Z0-9]{0,6}(&[a-zA-Z0-9_]{1,8}=[a-zA-Z0-9]{0,6}){0,3})?",
        fullmatch=True,
    )
    frag = st.sampled_from(["", "#x", "#frag-1"])
    scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS"])
    port = st.sampled_from(["", ":80", ":443", ":8080"])

    @settings(max_examples=300, deadline=None)
    @given(scheme, host, port, path, query, frag)
    def check(sc, h, po, pa_, q, f):
        url = f"{sc}://{h}{po}{pa_}{q}{f}"
        c1 = canonical_url(url)
        if c1 is not None:
            assert canonical_url(c1) == c1, (url, c1, canonical_url(c1))

    check()


def test_link_kernels_survive_garbage():
    from hinbox_ray.functions.links import (
        canonical_url,
        extract_anchors,
        extract_hrefs,
    )

    garbage = [
        b"",
        b"\x00\xff\xfe<a href=",
        b"<a href='" + b"x" * 100_000 + b"'>big</a>",
        "<a href=  >odd whitespace</a>".encode(),
        b"<!--<a href='http://c.example'>commented out</a>-->",
        b"<<<<>>>> &notanentity; <a <a <a",
        "<a href='http://ü.example/p'>idn</a>".encode(),
    ]
    for g in garbage:
        hrefs = extract_hrefs(g)
        anchors = extract_anchors(g)
        assert [h for h, _ in anchors] == hrefs  # consistent views
        for h in hrefs:
            canonical_url(h)  # never raises
    # commented-out anchors contribute nothing (tokenizer, not regex)
    assert extract_hrefs(garbage[4]) == []


def test_hits_matches_bruteforce(ray_session):
    """Independent dense integer-HITS loop over the brute-force host
    graph — same floor arithmetic (L1-normalize to the e6 grid after
    every half-step) with arbitrary-precision ints, no shared code with
    the Ray kernel or the SQL oracle."""
    SCALE = 10**6
    edges = _brute_hostgraph(_doc_ids())
    nodes = sorted({k[0] for k in edges} | {k[1] for k in edges})
    hub = {v: SCALE // len(nodes) for v in nodes}
    auth = None
    for _ in range(2):
        raw = {v: 0 for v in nodes}
        for (src, dst), w in edges.items():
            raw[dst] += w * hub[src]
        s = sum(raw.values())
        auth = {v: (SCALE * raw[v]) // s for v in nodes}
        raw = {v: 0 for v in nodes}
        for (src, dst), w in edges.items():
            raw[src] += w * auth[dst]
        s = sum(raw.values())
        hub = {v: (SCALE * raw[v]) // s for v in nodes}

    got = E.queries()["kg_hits_planted"](SF).to_pandas()
    assert {r.host: r.auth_e6 for r in got.itertuples()} == auth
    assert {r.host: r.hub_e6 for r in got.itertuples()} == hub
    # non-vacuous: both vectors differentiate hosts and differ from
    # each other (directed weights are asymmetric)
    assert got["auth_e6"].nunique() > 1
    assert got["hub_e6"].nunique() > 1
    assert (got["auth_e6"] != got["hub_e6"]).any()
