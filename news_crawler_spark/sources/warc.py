"""WARC (Web ARChive, ISO 28500) segment source/sink + CDX indexing.

The reference crawler (reference: src/secbot/fetchers/news.py:85-124
— `_fetch_feed` requests loop, pages held in memory / handed to the
digest sink) has no archival
format; a web-scale crawl needs one, and WARC is the interchange format
the ecosystem standardizes on (Common Crawl, Internet Archive). This
module gives the engine that capability Spark-first:

* **Reader geometry** — one WARC segment file per task via
  ``spark.read.format("binaryFile")``, which is exactly how Common
  Crawl segments are processed at scale (a ~1 GiB ``.warc`` per split;
  the record framing is not line-oriented and gzip members are not
  splittable, so whole-file tasks ARE the right parallel unit). Record
  parsing happens inside ``mapInPandas`` — Arrow-batched, never
  per-row Python at the DataFrame surface. Both plain ``.warc`` and
  Common Crawl's actual on-disk form ``.warc.gz`` (one gzip MEMBER
  per record, members concatenated — the layout that lets an index
  server range-request a single record) are read transparently:
  ``gzip.decompress`` consumes the whole member chain and the frame
  parser sees one contiguous stream.
* **Writer geometry** — one segment per input partition, written from
  the executor, with a manifest row (path, record count, byte count,
  payload digest) per segment. Segment content is a deterministic
  function of the partition's rows, so task retries rewrite identical
  bytes (idempotent under speculative execution; a real cluster would
  additionally stage through a commit protocol à la
  FileOutputCommitter).
* **CDX** — the (SURT key, timestamp, original URL, digest, length)
  index rows that make an archive randomly accessible; pure native
  expressions, so Catalyst can prune/push as usual.

Binary-safety: record payloads are sliced by ``Content-Length``, never
by scanning for separators, so payloads containing ``\\r\\n\\r\\nWARC/1.0``
round-trip exactly (tested).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_RECORD = T.StructType(
    [
        T.StructField("segment", T.StringType(), False),
        T.StructField("record_id", T.StringType(), False),
        T.StructField("warc_type", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

MANIFEST = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
    ]
)

_CRLF = b"\r\n"


def record_bytes(url: str, warc_date: str, content_type: str,
                 payload: bytes, warc_type: str = "response") -> bytes:
    """Serialize one WARC/1.0 record. The record id is a content
    address (sha256 of url+date+payload) so re-serialization is
    bit-identical — the property the idempotent-writer claim rests on."""
    rid = hashlib.sha256(
        url.encode() + b"\x00" + warc_date.encode() + b"\x00" + payload
    ).hexdigest()
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:sha256:{rid}>\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + _CRLF + _CRLF


_GZ_MAGIC = b"\x1f\x8b"


def record_member_gz(record: bytes) -> bytes:
    """One WARC record as one gzip MEMBER — the Common Crawl
    ``.warc.gz`` layout (record-granular members so an index server
    can range-request and decompress a single record). ``mtime=0``
    pins the gzip header timestamp, keeping the member a pure
    function of the record bytes — the idempotent-writer contract
    extends to the compressed form (determinism unit-tested)."""
    return gzip.compress(record, compresslevel=6, mtime=0)


def split_members(blob: bytes) -> bytes:
    """Decompress a concatenated-gzip-member segment to one contiguous
    record stream (``gzip.decompress`` consumes every member); plain
    segments pass through untouched, keyed on the gzip magic."""
    if blob[:2] == _GZ_MAGIC:
        return gzip.decompress(blob)
    return blob


def parse_segment(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (header-fields, payload) per record in one segment.
    Payloads are sliced by Content-Length (binary-safe); header keys
    are lower-cased. Malformed framing raises — a torn segment should
    fail the task loudly, not silently drop records."""
    i, n = 0, len(blob)
    while i < n:
        while blob[i:i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        if not blob.startswith(b"WARC/", i):
            raise ValueError(f"bad WARC framing at offset {i}")
        hdr_end = blob.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        fields: dict[str, str] = {}
        for line in blob[i:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0"))
        payload = blob[hdr_end + 4: hdr_end + 4 + clen]
        if len(payload) != clen:
            raise ValueError("truncated WARC payload")
        yield fields, payload
        i = hdr_end + 4 + clen


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC read: binaryFile (one segment per task) →
    Arrow-batched record split. At 100 TB the parallelism is the
    segment count (Common Crawl: ~80k segments/crawl), which is the
    correct grain — segment bytes never shuffle, parsing is
    embarrassingly parallel, and downstream ops see a normal columnar
    DataFrame with the payload as an opaque binary column (the
    multimodal operators' contract)."""
    # alternation, NOT a trailing wildcard: '*.warc*' would also match
    # '.inprogress-<uuid>' staging files left by crashed attempts —
    # parsing a torn temp fails the read (or double-reads a complete
    # unrenamed one); the suffix-anchored glob admits only published
    # segments
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{warc,warc.gz}")
        .load(path)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in WARC_RECORD.fields}
            for r in pdf.itertuples(index=False):
                for fields, payload in parse_segment(
                        split_members(bytes(r.content))):
                    rows["segment"].append(os.path.basename(r.path))
                    rows["record_id"].append(fields.get("warc-record-id", ""))
                    rows["warc_type"].append(fields.get("warc-type", ""))
                    rows["url"].append(fields.get("warc-target-uri"))
                    rows["warc_date"].append(fields.get("warc-date"))
                    rows["content_type"].append(fields.get("content-type"))
                    rows["n_bytes"].append(len(payload))
                    rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return files.mapInPandas(run, schema=WARC_RECORD)


def write_warc(df: DataFrame, out_dir: str,
               warc_type: str = "response",
               compress: bool = False) -> list[dict]:
    """WARC write: each partition of ``df`` (columns url, warc_date,
    content_type, payload:binary) becomes one segment
    ``part-{pid:05d}.warc`` (or ``.warc.gz`` with ``compress=True`` —
    one gzip member PER RECORD, the Common Crawl segment layout, with
    pinned mtime so compressed segments stay a deterministic function
    of the rows); returns the collected manifest (this IS
    the action — a sink, like ``df.write``). Segment names come from
    the partition id and the bytes are a deterministic function of
    the partition's rows, so a retried task overwrites its own
    identical output. The manifest's ``n_bytes``/``payload_sha256``
    describe the UNCOMPRESSED record stream either way, so plain and
    gzip segments carrying the same records attest identically.

    SCOPE: segments are written with plain file IO, so ``out_dir``
    must be a filesystem every executor shares with the driver
    (local mode, NFS/FUSE mounts). A multi-node object-store
    deployment should route this through the Hadoop FS API + a
    commit protocol instead — the record serialization
    (``record_bytes``) is the part that carries over unchanged."""
    os.makedirs(out_dir, exist_ok=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = bytearray()
        n_rec = 0
        n_raw = 0
        digest = hashlib.sha256()
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                rec = record_bytes(r.url, r.warc_date, r.content_type,
                                   payload, warc_type=warc_type)
                n_raw += len(rec)
                buf += record_member_gz(rec) if compress else rec
                digest.update(payload)
                n_rec += 1
        if n_rec == 0:
            return
        ext = "warc.gz" if compress else "warc"
        path = os.path.join(out_dir, f"part-{pid:05d}.{ext}")
        # a retry after a compress-flag change must not leave this
        # partition's OTHER-extension segment behind — read_warc would
        # load both and duplicate every record
        other = os.path.join(
            out_dir, f"part-{pid:05d}.{'warc' if compress else 'warc.gz'}")
        if os.path.exists(other):
            os.remove(other)
        # sweep stale staging files from crashed prior attempts of this
        # partition (never published — but disk they hold is dead)
        import glob as _glob

        for stale in _glob.glob(f"{path}.inprogress-*"):
            try:
                os.remove(stale)
            except OSError:
                pass
        # per-attempt temp name: two live attempts of one task
        # (speculation / a zombie task surviving a retry) must never
        # share a staging file, or their writes could interleave and
        # os.replace would publish a torn segment. Each attempt writes
        # its own file; replace stays last-writer-wins atomic, and
        # both attempts produce identical bytes by construction.
        tmp = f"{path}.inprogress-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(bytes(buf))
        os.replace(tmp, path)  # atomic: readers never see a torn segment
        yield pd.DataFrame({
            "path": [path], "n_records": [n_rec],
            "n_bytes": [n_raw], "payload_sha256": [digest.hexdigest()],
        })

    return [r.asDict() for r in df.mapInPandas(run, schema=MANIFEST).collect()]


def cdx_records(df: DataFrame, url_col: str = "url", ts_col: str = "ts14",
                digest_col: str = "digest", length_col: str = "length") -> DataFrame:
    """CDX index rows from fetched-record metadata: the (SURT key,
    timestamp, url, digest, length) tuples an archive's index server
    serves. SURT here is the standard simplified form — host labels
    reversed and comma-joined, then ')' + path — which sorts all of a
    registrable domain's captures adjacently (the property CDX relies
    on for prefix scans). Pure native expressions: at scale this is a
    projection + sort, and the sort key is exactly the index's
    physical layout, so `sortWithinPartitions(surt)` + range
    partitioning would write shard files directly servable as a
    ZipNum-style index."""
    host = F.regexp_extract(F.col(url_col), "^[a-z]+://([^/]+)", 1)
    path = F.regexp_extract(F.col(url_col), "^[a-z]+://[^/]+(/.*)$", 1)
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, "\\.")), ","),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
    )
    return df.select(
        surt.alias("surt"),
        F.col(ts_col).alias("ts14"),
        F.col(url_col).alias("url"),
        F.col(digest_col).alias("digest"),
        F.col(length_col).cast("long").alias("length"),
    )


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Bridge WARC conversion/response records (sources/warc.py
    read_warc output) into the north-rule documents shape
    (doc_id, spans): doc_id = target URI, payload decodes to ONE text
    span at offset 0. The loader that makes an archived crawl (ours or
    Common Crawl WET) re-enter every operator in this engine —
    dedup/quality/packing all consume exactly this shape. Pure native
    expressions; media records (non-text content_type) become a media
    span carrying the record id as media_ref."""
    is_text = F.col("content_type").startswith("text/")
    span = F.struct(
        F.when(is_text, F.lit("text")).otherwise(F.lit("media"))
         .alias("kind"),
        F.when(is_text, F.decode(F.col("payload"), "UTF-8"))
         .otherwise(F.lit("")).alias("text"),
        F.when(is_text, F.lit(""))
         .otherwise(F.col("record_id")).alias("media_ref"),
        F.lit(0).cast("int").alias("offset"))
    return records.select(
        F.col("url").alias("doc_id"),
        F.array(span).alias("spans"))
