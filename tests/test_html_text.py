"""Byte-identical HTML→text invariant tests.

Expected strings here are HAND-WRITTEN from the reference semantics
(/root/reference/scripts/get_miami_herald_articles.py:219-249) — they are
the independent oracle for the extractor; the generator-side `text`
column is produced by the same engine function, so these literals are
what keeps both honest.
"""

import pyarrow as pa
import pytest

from hinbox_ray.functions.html_text import (
    extract_article,
    extract_text_batch,
    parse_html,
)


def test_article_container_with_paragraphs():
    html = (
        "<html><body><h1> Big  News </h1>"
        "<article><p>First para.</p><p>Second para.</p></article></body></html>"
    )
    title, text = extract_article(html)
    assert title == "Big  News"
    assert text == "First para.\n\nSecond para."


def test_container_fallback_chain():
    # article > div.article-body > main > div.container
    html_ab = '<div class="article-body"><p>AB</p></div>'
    html_main = "<main><p>M</p></main>"
    html_cont = '<div class="container"><p>C</p></div>'
    assert extract_article(html_ab)[1] == "AB"
    assert extract_article(html_main)[1] == "M"
    assert extract_article(html_cont)[1] == "C"
    # article wins over all
    both = '<main><p>M</p></main><article><p>A</p></article>'
    assert extract_article(both)[1] == "A"


def test_no_container_returns_empty():
    assert extract_article("<div><p>loose</p></div>") == ("", "")


def test_advertisement_paragraphs_dropped():
    html = (
        "<article><p>Advertisement</p><p>Keep me.</p>"
        "<p>Advertisement — subscribe</p><p>Also kept.</p></article>"
    )
    assert extract_article(html)[1] == "Keep me.\n\nAlso kept."


def test_empty_paragraphs_skipped():
    html = "<article><p></p><p>  </p><p>Only one.</p></article>"
    assert extract_article(html)[1] == "Only one."


def test_get_text_fallback_when_no_paragraphs():
    html = "<main><span>One<br>Two</span>  <div>Three</div></main>"
    # get_text(separator="\n\n", strip=True): strings stripped, empties dropped
    assert extract_article(html)[1] == "One\n\nTwo\n\nThree"


def test_nested_tags_inside_p():
    html = "<article><p><strong>Bold</strong> and <em>italic</em> text.</p></article>"
    assert extract_article(html)[1] == "Bold and italic text."


def test_entities_decoded_and_unicode_preserved():
    html = "<article><p>Caf&eacute; &amp; r&#233;sum&#233;</p><p>naïve ümlaut</p></article>"
    assert extract_article(html)[1] == "Café & résumé\n\nnaïve ümlaut"


def test_header_title_fallback():
    html = "<header> The Header Title </header><article><p>x</p></article>"
    title, _ = extract_article(html)
    assert title == "The Header Title"


def test_h1_beats_header():
    html = "<header>H</header><h1>Main</h1><article><p>x</p></article>"
    assert extract_article(html)[0] == "Main"


def test_div_paragraph_is_a_tag_name_not_a_selector():
    # bs4 find_all(["p", "div.paragraph"]) matches no <div class="paragraph">
    html = (
        '<article><div class="paragraph">Not matched.</div>'
        "<p>Matched.</p></article>"
    )
    assert extract_article(html)[1] == "Matched."


def test_comments_contribute_no_text():
    html = "<article><p>A<!-- hidden -->B</p></article>"
    assert extract_article(html)[1] == "AB"


def test_nested_p_in_container_found_recursively():
    html = "<article><div><div><p>Deep.</p></div></div></article>"
    assert extract_article(html)[1] == "Deep."


def test_parse_is_graceful_on_unclosed_tags():
    html = "<article><p>unclosed<p>second</article>"
    # html.parser nests the second <p> inside the first (no auto-close);
    # outer p.text therefore contains both, inner repeats — matches the
    # stdlib tokenizer behavior the bs4 html.parser builder inherits.
    title, text = extract_article(html)
    assert "unclosed" in text and "second" in text


def test_extract_text_batch_kernel():
    from hinbox_ray.sources.pages import generate_pages_table

    t = generate_pages_table(24)
    out = extract_text_batch(t)
    assert out.column_names == ["url", "warc_ts", "lang", "title", "text", "text_ref"]
    # the invariant: extracted text equals the page table's text column
    assert out.column("text").to_pylist() == out.column("text_ref").to_pylist()


@pytest.mark.parametrize("branch", range(8))
def test_every_template_branch_satisfies_invariant(branch):
    from hinbox_ray.sources.pages import synthesize_page

    row = synthesize_page(branch + 800)  # arbitrary ids covering each branch
    _, text = extract_article(row["html"].decode("utf-8"))
    assert text == row["text"]


# ── round 5: fast-path tokenizer (differential vs the full parser) ──


def _slow_extract(html: str):
    """extract_article semantics forced through the full stdlib-parser
    path (the pre-round-5 implementation)."""
    from hinbox_ray.functions.html_text import _collect_firsts, parse_html

    soup = parse_html(html)
    firsts = _collect_firsts(soup)
    article = (
        firsts.get("article")
        or firsts.get("div.article-body")
        or firsts.get("main")
        or firsts.get("div.container")
    )
    if article is None:
        return "", ""
    t = firsts.get("h1") or firsts.get("header")
    tt = t.text.strip() if t is not None else ""
    ps = article.find_all(["p", "div.paragraph"])
    if ps:
        ct = "\n\n".join(
            s
            for p in ps
            if (s := p.text.strip()) and not s.startswith("Advertisement")
        )
    else:
        ct = article.get_text(separator="\n\n", strip=True)
    return tt, ct


def test_fast_path_covers_every_template_branch():
    """The fast tokenizer must HANDLE (not bail on) all generator
    branches — otherwise the round-5 speedup silently evaporates."""
    from hinbox_ray.functions.html_text import _parse_fast
    from hinbox_ray.sources.pages import synthesize_page

    for doc_id in range(64):
        html = synthesize_page(doc_id)["html"].decode("utf-8")
        assert _parse_fast(html) is not None, f"bailed on branch {doc_id % 8}"


def test_fast_path_differential_on_generator_pages():
    from hinbox_ray.sources.pages import synthesize_page

    for doc_id in range(200):
        html = synthesize_page(doc_id)["html"].decode("utf-8")
        assert extract_article(html) == _slow_extract(html)


ADVERSARIAL = [
    "<!-- comment --><article><p>a</p></article>",
    "<!DOCTYPE html><article><p>a</p></article>",
    "<?pi ?><article><p>a</p></article>",
    "<article><script>var x = '<p>no</p>';</script><p>a</p></article>",
    "<article><style>p{}</style><p>a</p></article>",
    "<article><p class='single'>a</p></article>",
    "<article><p hidden>a</p></article>",
    '<article><p title="a > b">a</p></article>',
    '<article><p title="a &amp; b">a</p></article>',
    "<article><p>broken",
    "<article><p>a</p>< notatag</article>",
    "<ARTICLE><P>upper</P></ARTICLE>",
    "<article><br/><p>void</p><img src=x></article>",
    "<article><p></p><p>  </p><p>keep</p></article>",
    "<article><p>Advertisement — drop</p><p>keep</p></article>",
    "<main><span>no paragraphs at all</span></main>",
    "garbage bytes \x00\x01 <article><p>a&lt;b</p></article>",
    "<article><p>a&eacute;b &amp; c &notarealentity; d</p></article>",
    "<div class=\"container\"><p>fallback</p></div>",
    "<div class=\"article-body extra\"><p>two classes</p></div>",
    "",
    "<p>no container</p>",
]


@pytest.mark.parametrize("html", ADVERSARIAL)
def test_fast_path_differential_adversarial(html):
    """On every adversarial input the fast path either bails (full
    parser takes over) or produces byte-identical extraction."""
    assert extract_article(html) == _slow_extract(html)


def test_fast_path_bails_on_cdata_and_comments():
    from hinbox_ray.functions.html_text import _parse_fast

    assert _parse_fast("<article><script>x</script></article>") is None
    assert _parse_fast("<!-- c --><article></article>") is None
    assert _parse_fast("<article><p unterminated-tag") is None
    assert _parse_fast("<article><p class='sq'>a</p></article>") is None
