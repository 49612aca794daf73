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


def html_to_spans(html: str) -> list[tuple[str, str, str, int]]:
    p = _SpanParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # truncated/hostile HTML: keep spans parsed so far (T5)
    return p.spans


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
