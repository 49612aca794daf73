"""HTML → ordered span sequence, stdlib-only (no bs4 in the image).

Replicates the *shape* of the reference's BeautifulSoup traversals
(``news.py:95-122``: ordered div walk emitting link/text/date spans;
``asec.py:97-105``: text flatten + anchor harvest): a linear document
scan emitting ``(kind, text, media_ref, offset)`` in document order.

Used by the real-HTTP fetch path and by the ``parse_spans`` pandas
UDF; the synthetic fixture path bypasses it (pages are already
spans). Pure Python is fine here — it runs only inside the Arrow
batch of the parse UDF, the designated Python island (§2.13).
"""

from __future__ import annotations

import re as _re
from html import unescape as _unescape
from html.parser import HTMLParser


class _SpanParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[tuple[str, str, str, int]] = []
        self._href: str | None = None
        self._anchor_text: list[str] = []
        self._in_title = False

    def _emit(self, kind: str, text: str, media_ref: str = "") -> None:
        self.spans.append((kind, text, media_ref, len(self.spans)))

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "a":
            self._href = d.get("href", "")
            self._anchor_text = []
        elif tag in ("img", "video", "audio", "source"):
            src = d.get("src", "")
            if src:
                self._emit("media", d.get("alt", ""), src)
        elif tag == "title":
            self._in_title = True
        elif tag == "time":
            dt = d.get("datetime", "")
            if dt:
                self._emit("date", dt)

    def handle_endtag(self, tag):
        if tag == "a":
            self._emit("link", " ".join(self._anchor_text).strip(), self._href or "")
            self._href = None
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        text = data.strip()
        if not text:
            return
        if self._href is not None:
            self._anchor_text.append(text)
        elif self._in_title:
            self._emit("title", text)
        else:
            self._emit("text", text)


def _stdlib_spans(html: str) -> list[tuple[str, str, str, int]]:
    p = _SpanParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # truncated/hostile HTML: keep spans parsed so far (T5)
    return p.spans


# fast scanner (html_to_spans below): tag-open matcher mirroring
# html.parser's tolerant tag-name grammar
_FAST_TAG = _re.compile(r"<(/?)([a-zA-Z][-.a-zA-Z0-9:_]*)")
# attribute grammar lifted from CPython html.parser attrfind_tolerant
# so name/value tokenization matches the stdlib parser exactly
_ATTR = _re.compile(
    r"((?<=[\'\"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*"
    r"(\'[^\']*\'|\"[^\"]*\"|(?![\'\"])[^>\s]*))?(?:\s|/(?!>))*")
# parse_starttag's post-tag-name junk skipper (tagfind_tolerant tail)
_WS_SLASH = _re.compile(r"(?:\s|/(?!>))*")


def _fast_spans(doc: str) -> list[tuple[str, str, str, int]] | None:
    """Single-pass scanner equivalent to :class:`_SpanParser` on
    well-formed-enough HTML; returns None (bail to the stdlib parser)
    on anything whose tokenization could diverge — quotes spanning
    '>', CDATA content elements, processing instructions, truncated
    tags, bogus end tags. Property-tested equal to the stdlib path
    (tests/test_htmlspans_fast.py); ~4x faster, which matters because
    this parser IS the crawl fetch path's per-page CPU."""
    spans: list[tuple[str, str, str, int]] = []
    href: str | None = None
    atext: list[str] = []
    in_title = False

    def emit(kind: str, text: str, media_ref: str = "") -> None:
        spans.append((kind, text, media_ref, len(spans)))

    def data(seg: str) -> None:
        nonlocal href, in_title
        if "&" in seg:
            seg = _unescape(seg)
        text = seg.strip()
        if not text:
            return
        if href is not None:
            atext.append(text)
        elif in_title:
            emit("title", text)
        else:
            emit("text", text)

    i, n = 0, len(doc)
    while i < n:
        lt = doc.find("<", i)
        if lt < 0:
            data(doc[i:])
            break
        if lt > i:
            data(doc[i:lt])
        if doc.startswith("<!--", lt):
            end = doc.find("-->", lt + 4)
            if end < 0:
                return None  # unterminated comment: stdlib edge path
            i = end + 3
            continue
        m = _FAST_TAG.match(doc, lt)
        if m is None:
            if doc.startswith("<!", lt):
                # declaration/bogus comment: consume to '>' iff clean
                gt = doc.find(">", lt)
                if gt < 0 or '"' in doc[lt:gt] or "'" in doc[lt:gt]:
                    return None
                i = gt + 1
                continue
            return None  # '<?', stray '<', '</' + junk — bail
        gt = doc.find(">", m.end())
        if gt < 0:
            return None  # truncated tag: stdlib edge semantics
        if doc.count('"', lt, gt) % 2 or doc.count("'", lt, gt) % 2:
            return None  # a quoted '>' would break this tokenization
        closing, name = m.group(1), m.group(2).lower()
        nxt = doc[m.end()] if m.end() < n else ""
        if not closing and nxt and nxt not in " \t\n\r\f/>":
            return None  # stdlib's tag-name grammar is wider — bail
        if name in ("script", "style"):
            return None  # CDATA content mode: let the stdlib handle it
        if closing:
            if doc[m.end():gt].strip():
                return None  # junk in an end tag: bail
            if name == "a":
                emit("link", " ".join(atext).strip(), href or "")
                href = None
            elif name == "title":
                in_title = False
        else:
            # replicate parse_starttag: skip (\s|/(?!>))*, then
            # contiguous tolerant attr matches, then the remainder up
            # to '>' must be '' or '/' — anything else bails (the
            # stdlib re-emits such tags as text)
            pos = _WS_SLASH.match(doc, m.end()).end()
            attrs: list[tuple[str, str]] = []
            while pos < gt:
                am = _ATTR.match(doc, pos)
                if am is None or am.start() != pos or am.end() == pos:
                    break
                if am.end() > gt:
                    return None  # attr value spans '>': bail
                aname = am.group(1).lower()
                aval = am.group(3)
                if aval is None:
                    aval = ""
                else:
                    if aval[:1] in "'\"":
                        aval = aval[1:-1]
                    if "&" in aval:
                        aval = _unescape(aval)
                attrs.append((aname, aval))
                pos = am.end()
            rest = doc[pos:gt].strip()
            if rest not in ("", "/"):
                return None
            selfclose = rest == "/"
            if name in ("a", "img", "video", "audio", "source", "time"):
                d = dict(attrs)  # duplicate attrs: last wins (stdlib)
                if name == "a":
                    href = d.get("href", "")
                    atext = []
                elif name == "time":
                    dt = d.get("datetime", "")
                    if dt:
                        emit("date", dt)
                else:  # img / video / audio / source
                    src = d.get("src", "")
                    if src:
                        emit("media", d.get("alt", ""), src)
            elif name == "title":
                in_title = True
            if selfclose:
                if name == "a":
                    emit("link", " ".join(atext).strip(), href or "")
                    href = None
                elif name == "title":
                    in_title = False
        i = gt + 1
    return spans


def html_to_spans(html: str) -> list[tuple[str, str, str, int]]:
    out = _fast_spans(html)
    if out is not None:
        return out
    return _stdlib_spans(html)


SPANS_TYPE = ("array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")


def parse_spans(col):
    """Standalone span-parse column UDF (SURVEY.md §2.13: the S6
    re-parse path — re-derive span sequences from stored HTML bodies
    without re-fetching). Arrow-batched scalar pandas UDF around
    :func:`html_to_spans`; null/empty bodies → empty span array, so a
    re-parse over a snapshot never throws mid-job.

    The fetch round parses inline inside its own mapInPandas island
    (crawl/fetch.py) — this is the same parser exposed as a column
    function for DataFrame-level re-parse/backfill jobs.
    """
    import pandas as pd  # noqa: F401 — resolves the UDF type hints
    from pyspark.sql import functions as F

    @F.pandas_udf(SPANS_TYPE)
    def _parse(bodies):
        # untyped signature + explicit returnType: the hint-based
        # form needs module-global pandas for annotation resolution
        return bodies.map(
            lambda h: [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for k, t, m, o in html_to_spans(h)
            ] if isinstance(h, str) and h else [])

    return _parse(col)
