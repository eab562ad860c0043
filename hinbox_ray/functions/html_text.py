"""HTML → article text extraction (the per-row invariant of the engine).

Reproduces the extraction semantics of the reference scraper
(``/root/reference/scripts/get_miami_herald_articles.py:219-249``):

1. Parse HTML (reference: ``BeautifulSoup(content, "html.parser")``).
2. Container = first ``<article>``, else first ``<div class="article-body">``,
   else first ``<main>``, else first ``<div class="container">``; no
   container → no result (title/text both ``""``).
3. Title = text of first ``<h1>``, else first ``<header>``, stripped.
4. Paragraphs = ``container.find_all(["p", "div.paragraph"])`` — note that
   bs4 treats ``"div.paragraph"`` as a literal *tag name* (not a CSS
   selector), so this matches only ``<p>`` descendants, in document order.
5. If any paragraphs: join ``p.text.strip()`` with ``"\n\n"`` for non-empty
   paragraphs that do not start with ``"Advertisement"``.
6. Else: ``container.get_text(separator="\n\n", strip=True)``.

bs4 is not available in this environment, so this module implements the
same semantics on a minimal DOM built with the stdlib ``html.parser``
(the same tokenizer bs4's ``"html.parser"`` tree builder uses):

- character references are decoded (``convert_charrefs=True``, bs4's
  default for this builder);
- void elements never take children;
- ``element.text`` is the concatenation of all descendant text nodes in
  document order with no separator;
- ``get_text(separator, strip=True)`` joins the stripped, non-empty
  descendant text nodes with the separator;
- comments, processing instructions and declarations contribute no text.

The synthetic page generator (``hinbox_ray.sources.pages``) emits
well-formed HTML (explicitly closed tags), so no error-recovery
heuristics are needed; unclosed tags degrade gracefully (auto-closed at
ancestor close / EOF) rather than raising.

All functions are pure; the batch wrapper ``extract_text_batch`` is the
``map_batches(batch_format="pyarrow")`` kernel used by the pipeline.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from typing import List, Optional, Tuple

import pyarrow as pa

# HTML void elements (can never hold children) — per the WHATWG list,
# matching bs4's empty_element_tags for the html.parser builder.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Node:
    """One element of the minimal DOM tree."""

    __slots__ = ("tag", "classes", "children")

    def __init__(self, tag: str, classes: Tuple[str, ...] = ()):
        self.tag = tag
        self.classes = classes
        self.children: List = []  # str (text node) | _Node

    # ── bs4-equivalent accessors ──

    def iter_strings(self):
        """Yield descendant text nodes in document order."""
        stack = [iter(self.children)]
        while stack:
            try:
                child = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if isinstance(child, str):
                yield child
            else:
                stack.append(iter(child.children))

    @property
    def text(self) -> str:
        """Concatenation of all descendant strings (bs4 ``Tag.text``)."""
        return "".join(self.iter_strings())

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        if not strip:
            return separator.join(self.iter_strings())
        return separator.join(s2 for s in self.iter_strings() if (s2 := s.strip()))

    def find(self, tag: str, class_: Optional[str] = None) -> Optional["_Node"]:
        """First descendant element with the given tag (and class), doc order."""
        for node in self._iter_elements():
            if node.tag == tag and (class_ is None or class_ in node.classes):
                return node
        return None

    def find_all(self, tags) -> List["_Node"]:
        wanted = frozenset(tags) if not isinstance(tags, str) else frozenset((tags,))
        return [n for n in self._iter_elements() if n.tag in wanted]

    def _iter_elements(self):
        stack = [iter(self.children)]
        while stack:
            try:
                child = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if not isinstance(child, str):
                yield child
                stack.append(iter(child.children))


class _TreeBuilder(HTMLParser):
    """Build the minimal DOM. convert_charrefs=True decodes entities in data."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]")
        self._stack: List[_Node] = [self.root]

    def handle_starttag(self, tag, attrs):
        classes: Tuple[str, ...] = ()
        for k, v in attrs:
            if k == "class" and v:
                classes = tuple(v.split())
                break
        node = _Node(tag, classes)
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):  # <tag ... />
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self._stack.pop()

    def handle_endtag(self, tag):
        # Close the nearest matching open element (graceful on mismatches).
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)

    # comments / PIs / declarations contribute no text
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass


def parse_html(html: str) -> _Node:
    """Parse HTML into the minimal DOM; returns the document root."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# ──────────────────────────────────────────────
# Fast path: specialized tokenizer for plain well-formed markup
# ──────────────────────────────────────────────
#
# ~80 % of the fused extraction stage's CPU is the stdlib HTMLParser's
# generality (per-tag regex machinery, position bookkeeping). Web-scale
# article HTML is overwhelmingly plain: lowercase tags, double-quoted
# attributes, no script/style in the body path. This scanner handles
# exactly that profile ~6× faster and BAILS to the full parser the
# moment it sees anything it cannot prove equivalent (comments,
# declarations, PIs, script/style CDATA modes, unquoted/single-quoted
# attributes, stray '<', unterminated tags). Equivalence fast↔slow is
# pinned by tests/test_html_text.py differential tests over the
# generator's 8 template branches plus adversarial cases.

# whole start-tag body: name + zero or more double-quoted attributes.
# Attribute values may not contain '"', '<', '>', '&' (entity-bearing
# or oddly-quoted values bail to the full parser).
_SIMPLE_START = re.compile(
    r'([a-zA-Z][a-zA-Z0-9]*)((?:\s+[a-zA-Z][a-zA-Z0-9-]*="[^"<>&]*")*)\s*$'
)
_SIMPLE_END = re.compile(r"([a-zA-Z][a-zA-Z0-9]*)\s*$")
_CLASS_ATTR = re.compile(r'\s(?i:class)="([^"]*)"')
# stdlib HTMLParser switches to CDATA mode for these (content until the
# matching close tag is raw text) — out of the fast profile
_CDATA_TAGS = frozenset(("script", "style"))


# parsed-start-tag memo: raw tag bodies repeat heavily (every "<p>",
# "</p>", template attrs...), so one regex parse per DISTINCT body
# amortizes to ~zero. Bounded: cleared when it outgrows the cap.
_TAG_MEMO: dict = {}
_TAG_MEMO_CAP = 8192

# container/title tags extract_article needs the FIRST occurrence of —
# recorded during the parse so no post-hoc tree walks are needed
_FIRST_TAGS = frozenset(("article", "main", "h1", "header"))


def _parse_start_body(body: str):
    """(tag, classes, selfclose) for a start-tag body, or None (bail)."""
    hit = _TAG_MEMO.get(body)
    if hit is not None:
        return hit if hit != "BAIL" else None
    raw = body
    selfclose = body.endswith("/")
    if selfclose:
        body = body[:-1]
    m = _SIMPLE_START.match(body)
    if m is None or m.group(1).lower() in _CDATA_TAGS:
        if len(_TAG_MEMO) >= _TAG_MEMO_CAP:
            _TAG_MEMO.clear()
        _TAG_MEMO[raw] = "BAIL"
        return None
    tag = m.group(1).lower()
    classes: Tuple[str, ...] = ()
    attrs = m.group(2)
    if attrs:
        cm = _CLASS_ATTR.search(attrs)
        if cm is not None and cm.group(1):
            classes = tuple(cm.group(1).split())
    parsed = (tag, classes, selfclose)
    if len(_TAG_MEMO) >= _TAG_MEMO_CAP:
        _TAG_MEMO.clear()
    _TAG_MEMO[raw] = parsed
    return parsed


def _parse_fast_with_firsts(html: str):
    """Build the same minimal DOM as ``parse_html`` for the plain-markup
    profile, recording the first occurrence of each container/title
    candidate along the way; return (root, firsts) or None (caller
    falls back to the full parser)."""
    root = _Node("[document]")
    stack = [root]
    firsts: dict = {}
    i = 0
    n = len(html)
    find = html.find
    while True:
        lt = find("<", i)
        if lt == -1:
            if i < n:
                chunk = html[i:]
                stack[-1].children.append(
                    unescape(chunk) if "&" in chunk else chunk
                )
            break
        if lt > i:
            chunk = html[i:lt]
            stack[-1].children.append(
                unescape(chunk) if "&" in chunk else chunk
            )
        gt = find(">", lt + 1)
        if gt == -1:
            return None  # unterminated tag → full parser semantics
        body = html[lt + 1 : gt]
        if not body:
            return None
        c0 = body[0]
        if c0 == "/":
            m = _SIMPLE_END.match(body, 1)
            if m is None:
                return None
            tag = m.group(1).lower()
            # close nearest matching open element (same as _TreeBuilder)
            for k in range(len(stack) - 1, 0, -1):
                if stack[k].tag == tag:
                    del stack[k:]
                    break
        elif c0.isalpha():
            parsed = _parse_start_body(body)
            if parsed is None:
                return None
            tag, classes, selfclose = parsed
            node = _Node(tag, classes)
            stack[-1].children.append(node)
            if tag not in _VOID and not selfclose:
                stack.append(node)
            if tag in _FIRST_TAGS:
                if tag not in firsts:
                    firsts[tag] = node
            elif tag == "div" and classes:
                if "article-body" in classes:
                    firsts.setdefault("div.article-body", node)
                if "container" in classes:
                    firsts.setdefault("div.container", node)
        else:
            # comment / doctype / PI / literal '<' — full parser territory
            return None
        i = gt + 1
    return root, firsts


def _parse_fast(html: str) -> Optional[_Node]:
    res = _parse_fast_with_firsts(html)
    return res[0] if res is not None else None


def _collect_firsts(soup: _Node) -> dict:
    """First occurrence of each container/title candidate in document
    order — one walk instead of one ``find`` walk per candidate."""
    firsts: dict = {}
    for node in soup._iter_elements():
        tag = node.tag
        if tag in _FIRST_TAGS:
            if tag not in firsts:
                firsts[tag] = node
        elif tag == "div" and node.classes:
            if "article-body" in node.classes:
                firsts.setdefault("div.article-body", node)
            if "container" in node.classes:
                firsts.setdefault("div.container", node)
    return firsts


def extract_article(html: str) -> Tuple[str, str]:
    """Extract ``(title, content_text)`` per the reference semantics.

    Returns ``("", "")`` when no recognized container exists (the
    reference returns None in that case; we map that to empty strings so
    the column stays non-null).
    """
    res = _parse_fast_with_firsts(html)
    if res is None:
        soup = parse_html(html)
        firsts = _collect_firsts(soup)
    else:
        soup, firsts = res

    article = (
        firsts.get("article")
        or firsts.get("div.article-body")
        or firsts.get("main")
        or firsts.get("div.container")
    )
    if article is None:
        return "", ""

    title = firsts.get("h1") or firsts.get("header")
    title_text = title.text.strip() if title is not None else ""

    # bs4 treats "div.paragraph" as a tag *name*, so only <p> matches.
    paragraphs = article.find_all(["p", "div.paragraph"])
    if paragraphs:
        content_text = "\n\n".join(
            stripped
            for p in paragraphs
            if (stripped := p.text.strip()) and not stripped.startswith("Advertisement")
        )
    else:
        content_text = article.get_text(separator="\n\n", strip=True)

    return title_text, content_text


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` kernel: html binary column → title/text columns.

    Input : north-rule schema (url, warc_ts, html, text, lang).
    Output: url, warc_ts, lang, title, text (extracted), text_ref (the
    input ``text`` column, kept so the invariant check can compare).

    Parsing is inherently per-document Python work (the one hot loop the
    engine cannot vectorize); it runs inside stateless map_batches tasks
    so it scales linearly with cores/nodes. The html column is dropped on
    output so downstream blocks are narrow.
    """
    htmls = batch.column("html").to_pylist()
    titles: List[str] = []
    texts: List[str] = []
    for h in htmls:
        if isinstance(h, bytes):
            h = h.decode("utf-8", errors="replace")
        title, text = extract_article(h or "")
        titles.append(title)
        texts.append(text)

    out = {
        "url": batch.column("url"),
        "warc_ts": batch.column("warc_ts"),
        "lang": batch.column("lang"),
        "title": pa.array(titles, type=pa.string()),
        "text": pa.array(texts, type=pa.large_string()),
    }
    if "text" in batch.column_names:
        out["text_ref"] = batch.column("text")
    return pa.table(out)
