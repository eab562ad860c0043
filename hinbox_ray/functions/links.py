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
