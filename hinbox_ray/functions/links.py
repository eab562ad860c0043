"""Hyperlink extraction — the web-graph primitive over page HTML.

Common-Crawl-scale KG construction consumes the hyperlink structure as
well as the text: the host-level link graph drives crawl frontier
ranking, spam/host authority features and entity-page discovery. This
module extracts ``<a href=...>`` targets from raw HTML bytes with the
same stdlib-tokenizer foundation as the text extractor
(``functions/html_text.py``), so attribute quoting, character
references (``&amp;`` in query strings) and malformed markup are
handled by a real HTML tokenizer, not a regex.

Pure functions only; the batch kernel lives in ``__ray_entry__`` next
to the other planted-graph consumers.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional


class _HrefCollector(HTMLParser):
    """Collect ``href`` values of anchor start tags, document order.

    ``convert_charrefs=True`` (stdlib default) decodes entities inside
    attribute values, so ``href="a?x=1&amp;y=2"`` yields ``a?x=1&y=2``
    — the same URL a browser resolves.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: List[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        for name, value in attrs:
            # first href wins (browsers ignore duplicate attributes)
            if name == "href" and value is not None:
                self.hrefs.append(value)
                return


def extract_hrefs(html: bytes | str) -> List[str]:
    """All anchor targets of a page, document order, entities decoded.

    Anchors without an ``href`` (or with a valueless bare ``href``)
    contribute nothing; duplicate links are kept (the host-graph edge
    weight counts them).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _HrefCollector()
    p.feed(html)
    p.close()
    return p.hrefs


def url_host(url: str) -> Optional[str]:
    """The lowercased host of an absolute http(s) URL, else ``None``.

    Deliberately minimal (no userinfo/IPv6 forms — the synthetic corpus
    never emits them); relative hrefs, fragments and non-http schemes
    (mailto:, javascript:) return ``None`` and are dropped from the
    host graph, matching what a crawl's outlink normalizer does first.
    """
    low = url.lower()
    if low.startswith("http://"):
        rest = url[7:]
    elif low.startswith("https://"):
        rest = url[8:]
    else:
        return None
    host = rest.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    if ":" in host:  # strip an explicit port
        host = host.split(":", 1)[0]
    return host.lower() or None


class _AnchorCollector(HTMLParser):
    """Collect (href, text) per anchor, document order.

    HTML forbids nested ``<a>``; per the WHATWG parser, a new anchor
    start tag implicitly closes any open one — mirrored here so
    malformed markup degrades the same way a browser does.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: List[tuple] = []
        self._href: Optional[str] = None
        self._buf: List[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            self.anchors.append((self._href, "".join(self._buf)))
        self._href = None
        self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        self._flush()  # implicit close of an open anchor
        for name, value in attrs:
            if name == "href" and value is not None:
                self._href = value
                return
        self._href = None  # href-less anchor: collect nothing

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush()  # unclosed anchor at EOF keeps its text


def extract_anchors(html: bytes | str) -> List[tuple]:
    """All (href, anchor_text) pairs of a page, document order.

    Text is the concatenation of the anchor's descendant text nodes
    with entities decoded — the alias-candidate string anchor-text
    mining consumes. Anchors without an href are dropped (no link, no
    alias evidence)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _AnchorCollector()
    p.feed(html)
    p.close()
    return p.anchors


def canonical_url(url: str) -> Optional[str]:
    """Crawl-style URL canonicalization: lowercase scheme+host, strip
    default ports (http:80 / https:443), drop the fragment, drop
    tracking params (``utm_*`` — other query params survive in order),
    and strip one trailing slash from a non-root path. Non-http(s)
    URLs return ``None`` (same contract as ``url_host``).

    This is the equivalence a crawl dedups on BEFORE content hashing:
    the variants differ in bytes but name the same resource.
    """
    low = url.lower()
    if low.startswith("http://"):
        scheme, rest = "http", url[7:]
    elif low.startswith("https://"):
        scheme, rest = "https", url[8:]
    else:
        return None

    rest = rest.split("#", 1)[0]  # fragment is client-side only
    hostpart, sep, tail = rest.partition("/")
    path_q = sep + tail if sep else ""
    hostport = hostpart.split("?", 1)[0].lower()
    if ":" in hostport:
        host, port = hostport.split(":", 1)
        if not (
            port == ""
            or (scheme == "http" and port == "80")
            or (scheme == "https" and port == "443")
        ):
            host = f"{host}:{port}"
    else:
        host = hostport
    if not host.split(":", 1)[0]:
        return None

    path, qsep, query = path_q.partition("?")
    if query:
        kept = [
            p for p in query.split("&") if not p.lower().startswith("utm_")
        ]
        query = "&".join(kept)
    # strip ALL trailing slashes (a single-slash strip is not
    # idempotent: '///' → '//' → '/' — caught by the hypothesis
    # idempotence property in tests/test_linkgraph.py)
    path = path.rstrip("/") or "/"
    return f"{scheme}://{host}{path}" + (f"?{query}" if query else "")
