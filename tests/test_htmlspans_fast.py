"""Equivalence of the fast span scanner vs the stdlib HTMLParser path.

html_to_spans is the crawl fetch path's per-page CPU; round 6 added a
single-pass regex scanner (_fast_spans) that bails to the stdlib
parser on anything outside its verified grammar. These tests pin
byte-for-byte equality of html_to_spans (fast+fallback composite)
against the pure-stdlib reference across the fixture corpus, hostile
mutations, and the bail cases themselves.
"""

import random

import pytest

from news_crawler_spark.fixtures.sitegen import SiteConfig, synth_html
from news_crawler_spark.functions.htmlspans import (
    _fast_spans,
    _stdlib_spans,
    html_to_spans,
)


def _cfg(**kw):
    base = dict(seed=42, n_hosts=20, base_pages=50, hot_factor=4, richness=2)
    base.update(kw)
    return SiteConfig(**base)


def test_fixture_corpus_fast_path_equal_and_taken():
    """Every sitegen page must take the fast path AND match stdlib."""
    for cfg in (_cfg(), _cfg(seed=7, richness=1), _cfg(seed=9, richness=3)):
        for i in range(200):
            url = cfg.page_url(i % cfg.n_hosts, i // cfg.n_hosts)
            _, html = synth_html(cfg, url)
            fast = _fast_spans(html)
            assert fast is not None, f"fixture page bailed: {url}"
            assert fast == _stdlib_spans(html)


def test_truncations_and_mutations_equal():
    cfg = _cfg()
    rng = random.Random(1234)
    snippets = [
        "&amp; x &lt;3 &#65;", "<!-- c -->", "<b>", "</b>", "<br/>",
        "<a href='s'>q</a>", "<IMG SRC=\"u.png\" ALT=x>",
        "<time datetime=\"2024-01-01\"/>", "<a href=\"x\">",
        "<title>t</title>", "text > here", "<a href=a&amp;b>t</a>",
    ]
    for i in range(150):
        _, html = synth_html(cfg, cfg.page_url(i % cfg.n_hosts, 0))
        if i % 3 == 0:
            html = html[: rng.randrange(1, len(html))]  # truncation
        if i % 3 == 1:
            pos = rng.randrange(len(html))
            html = html[:pos] + rng.choice(snippets) + html[pos:]
        assert html_to_spans(html) == _stdlib_spans(html)


@pytest.mark.parametrize("doc", [
    "",  # empty
    "plain text only",
    "a &amp; b < c",  # stray '<'
    "<a href=\"x>y\">t</a>",  # quoted '>' in attr
    "<script>var a = '<p>x</p>';</script>after",  # CDATA mode
    "<style>p > a {}</style>t",
    "<?php echo 1 ?>t",  # processing instruction
    "<!DOCTYPE html><p>x</p>",
    "<! bogus ><p>x</p>",
    "<a href='u' href='v'>dup</a>",  # duplicate attr: last wins
    "<a\nhref = 'u'\n>nl</a>",
    "<a href=unquoted>t</a>",
    "<p>a</p><p>b</p><a href=\"u\">x <b>y</b> z</a>",
    "<a href=\"u\"><img src=\"m\" alt=\"aa\"></a>",
    "<title>t1 <a href=\"u\">in</a> t2</title>",
    "<a@b c>t</a@b>",  # wide stdlib tag-name grammar
    "</ a>odd end tag",
    "<a data-x>t</a>",  # valueless attr
    "<a href=>t</a>",  # empty unquoted value
    "<img src=\"u\"/ >x",  # slash-space before '>'
    "<img src=\"u\" />x",
    "<a href=\"A&#65;&amp;\">e</a>",  # entity in attr and text
    "<a href='u'>x</a some junk>",
    "<time datetime=''></time>",
    "<img src=''>",
    "<a><a href='u'>nested</a></a>",
    "<a href='u'>unclosed anchor",
    "<p>tail < 5 and <a",  # truncated tag at EOF
])
def test_adversarial_docs_equal(doc):
    assert html_to_spans(doc) == _stdlib_spans(doc)


def test_bail_cases_route_to_stdlib():
    """Constructs the scanner must NOT attempt: verify it bails."""
    for doc in ["<script>x</script>", "<?pi?>", "<a href=\"x>y\">t</a>",
                "</ a>", "<a@b>t</a@b>", "<p>x< 1</p>"]:
        assert _fast_spans(doc) is None


def test_fuzz_equivalence():
    """Random tag soup from the grammar's alphabet: composite equals
    stdlib everywhere (fast path bails where unsure)."""
    rng = random.Random(99)
    atoms = ["<a href=\"u{}\">", "</a>", "<p>", "</p>", "w{} ",
             "<img src=\"m{}\" alt=\"t\">", "&amp;", "&#66;", "<title>",
             "</title>", "<time datetime=\"d{}\">", "</time>", "<br/>",
             "<!-- x -->", "<", ">", "\"", "'", "/", "<b", "text>",
             "<a href=x{} y>", "&bogus;", "  "]
    for i in range(400):
        doc = "".join(
            rng.choice(atoms).format(rng.randrange(10))
            for _ in range(rng.randrange(1, 25)))
        assert html_to_spans(doc) == _stdlib_spans(doc), doc
