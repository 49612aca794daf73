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
    record_member_gz,
    split_members,
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


def test_warc_gz_round_trip_equals_plain(spark, tmp_path):
    """Compressed segments (one gzip member per record — the Common
    Crawl layout) must read back record-identical to plain segments,
    and a mixed directory reads both transparently."""
    plain, gz = str(tmp_path / "plain"), str(tmp_path / "gz")
    m_plain = write_warc(_df(spark, ROWS), plain)
    m_gz = write_warc(_df(spark, ROWS), gz, compress=True)
    assert all(m["path"].endswith(".warc.gz") for m in m_gz)
    # manifests attest the UNCOMPRESSED stream: identical either way
    key = lambda ms: sorted((m["n_records"], m["n_bytes"],  # noqa: E731
                             m["payload_sha256"]) for m in ms)
    assert key(m_plain) == key(m_gz)

    want = sorted((r.url, r.warc_date, r.content_type, bytes(r.payload))
                  for r in read_warc(spark, plain).collect())
    got = sorted((r.url, r.warc_date, r.content_type, bytes(r.payload))
                 for r in read_warc(spark, gz).collect())
    assert got == want == sorted(ROWS)

    # mixed dir: one plain + one gz segment under the same root
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    os.link(glob.glob(plain + "/*.warc")[0], str(mixed / "a.warc"))
    os.link(glob.glob(gz + "/*.warc.gz")[0], str(mixed / "b.warc.gz"))
    assert read_warc(spark, str(mixed)).count() > 0


def test_warc_gz_write_is_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(_df(spark, ROWS), a, compress=True)
    write_warc(_df(spark, ROWS), b, compress=True)
    pas, pbs = (sorted(glob.glob(d + "/*.warc.gz")) for d in (a, b))
    assert pas and len(pas) == len(pbs)
    for pa, pb in zip(pas, pbs):
        assert open(pa, "rb").read() == open(pb, "rb").read()


def test_gz_members_are_record_granular():
    """Each record is its own gzip member (range-request property):
    decompressing ONE member yields exactly one record, and the
    concatenation splits back to the full stream — binary-safe with
    embedded framing bytes in the payload."""
    import gzip

    recs = [record_bytes(u, d, c, p) for u, d, c, p in ROWS]
    members = [record_member_gz(r) for r in recs]
    one = gzip.decompress(members[0])
    assert one == recs[0]
    assert split_members(b"".join(members)) == b"".join(recs)
    parsed = list(parse_segment(split_members(b"".join(members))))
    assert [(f["warc-target-uri"], p) for f, p in parsed] == \
        [(u, p) for u, d, c, p in ROWS]
    # plain stream passes through untouched
    assert split_members(b"".join(recs)) == b"".join(recs)


def test_read_warc_ignores_staging_files(spark, tmp_path):
    """A crashed attempt's '.inprogress-<uuid>' staging file (torn or
    complete-but-unrenamed) must be invisible to read_warc — the glob
    is suffix-anchored, so only published segments load."""
    out = str(tmp_path / "seg")
    write_warc(_df(spark, ROWS), out)
    n = read_warc(spark, out).count()
    published = glob.glob(out + "/*.warc")[0]
    torn = published + ".inprogress-deadbeef"
    with open(torn, "wb") as f:
        f.write(open(published, "rb").read()[:-7])  # torn copy
    whole = published + ".inprogress-cafebabe"
    with open(whole, "wb") as f:
        f.write(open(published, "rb").read())       # unrenamed copy
    assert read_warc(spark, out).count() == n       # neither is read

    # and a fresh write of the same partition sweeps the stale temps
    write_warc(_df(spark, ROWS), out)
    assert not glob.glob(out + "/*.inprogress-*")


def test_write_warc_compress_toggle_replaces_sibling(spark, tmp_path):
    """Re-writing a partition with the other compress setting must
    remove the old-extension segment — otherwise read_warc loads both
    and duplicates every record."""
    out = str(tmp_path / "seg")
    write_warc(_df(spark, ROWS, n_parts=1), out)
    write_warc(_df(spark, ROWS, n_parts=1), out, compress=True)
    assert not glob.glob(out + "/*.warc") or \
        all(p.endswith(".warc.gz") for p in glob.glob(out + "/*.warc*"))
    assert read_warc(spark, out).count() == len(ROWS)
    write_warc(_df(spark, ROWS, n_parts=1), out)  # toggle back
    assert read_warc(spark, out).count() == len(ROWS)


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
