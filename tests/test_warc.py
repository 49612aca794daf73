"""WARC segment source/sink: round-trip, binary safety, framing errors,
atomicity, and CDX derivation (sources/warc.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from news_crawler_spark.sources.warc import (
    cdx_records,
    parse_segment,
    read_warc,
    record_bytes,
    write_warc,
)

ROWS = [
    # payload deliberately embeds the record separator + magic so the
    # Content-Length slicing (not separator scanning) is what's tested
    ("https://news.example.com/a/1", "2026-01-01T00:00:00Z",
     "text/html", b"<html>one</html>\r\n\r\nWARC/1.0 fake inner"),
    ("https://news.example.com/a/2", "2026-01-02T00:00:00Z",
     "text/html", b""),  # empty payload
    ("https://img.example.com/b.png", "2026-01-03T00:00:00Z",
     "image/png", bytes(range(256)) * 4),  # non-UTF8 binary
]


def _df(spark, rows, n_parts=2):
    return spark.createDataFrame(
        [(u, d, c, bytearray(p)) for u, d, c, p in rows],
        "url string, warc_date string, content_type string, payload binary",
    ).repartition(n_parts)


def test_warc_round_trip(spark, tmp_path):
    out = str(tmp_path / "seg")
    manifest = write_warc(_df(spark, ROWS), out)
    assert sum(m["n_records"] for m in manifest) == len(ROWS)
    assert all(os.path.exists(m["path"]) for m in manifest)

    back = read_warc(spark, out)
    got = sorted(
        (r.url, r.warc_date, r.content_type, bytes(r.payload))
        for r in back.collect())
    assert got == sorted(ROWS)
    # framing metadata survives
    rec = back.where(F.col("url").endswith("/a/2")).first()
    assert rec.warc_type == "response" and rec.n_bytes == 0
    assert rec.record_id.startswith("<urn:sha256:")


def test_warc_write_is_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(_df(spark, ROWS), a)
    write_warc(_df(spark, ROWS), b)
    for pa, pb in zip(sorted(glob.glob(a + "/*.warc")),
                      sorted(glob.glob(b + "/*.warc"))):
        assert open(pa, "rb").read() == open(pb, "rb").read()


def test_warc_empty_partitions_write_no_segment(spark, tmp_path):
    out = str(tmp_path / "seg")
    manifest = write_warc(_df(spark, ROWS[:1], n_parts=8), out)
    assert sum(m["n_records"] for m in manifest) == 1
    assert len(glob.glob(out + "/*.warc")) == len(manifest)


def test_parse_segment_rejects_torn_records():
    good = record_bytes("https://x/y", "2026-01-01T00:00:00Z",
                        "text/html", b"abcdef")
    with pytest.raises(ValueError, match="truncated"):
        list(parse_segment(good[:-10]))
    with pytest.raises(ValueError, match="bad WARC framing"):
        list(parse_segment(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_record_bytes_content_addressed():
    a = record_bytes("https://x", "2026-01-01T00:00:00Z", "t/h", b"p")
    b = record_bytes("https://x", "2026-01-01T00:00:00Z", "t/h", b"p")
    c = record_bytes("https://x", "2026-01-01T00:00:00Z", "t/h", b"q")
    assert a == b and a != c


def test_cdx_records_surt_and_root_path(spark):
    df = spark.createDataFrame(
        [("https://news.example.com/docs/7", "20260101000000", "d7", 10),
         ("https://example.com", "20260101000001", "d8", 20)],
        "url string, ts14 string, digest string, length int")
    got = {r.url: r for r in cdx_records(df).collect()}
    assert got["https://news.example.com/docs/7"].surt == \
        "com,example,news)/docs/7"
    # no path → canonical '/'; host sorts under its domain prefix
    assert got["https://example.com"].surt == "com,example)/"
    assert got["https://example.com"].length == 20
