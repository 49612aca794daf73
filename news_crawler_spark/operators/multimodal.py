"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched UDFs.

The decode step is a STUB (image/audio libraries are not in this
container): ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a clearly-marked deterministic fake
derives metadata from the bytes — the Spark-side plumbing (schema,
batching, partition shape) is real and tested either way. Swap
``_fake_decode`` for PIL/ffmpeg calls on a cluster with the libs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def attach_binary(df: DataFrame, payload_col: str, doc_id_col: str = "doc_id",
                  media_type: str = "image/png") -> DataFrame:
    """Normalize a payload column into (doc_id, media_type, body:binary)."""
    return df.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).cast("binary").alias("body"),
    )


def _fake_decode(body: bytes, media_type: str) -> tuple[int | None, int | None, int | None]:
    """DETERMINISTIC FAKE decoder (container has no image/audio libs):
    pretends to parse dimensions/duration from a content hash."""
    h = hashlib.sha256(body).digest()
    if media_type.startswith("image/"):
        return 64 + h[0] % 1920, 64 + h[1] % 1080, None
    if media_type.startswith(("audio/", "video/")):
        return None, None, 1000 + int.from_bytes(h[2:5], "big") % 600_000
    return None, None, None


def decode_media(df: DataFrame, fake: bool = False,
                 batch_partitions: int | None = None) -> DataFrame:
    """Decode binary media → typed metadata via mapInPandas.

    ``df`` must have (doc_id, media_type, body:binary). The real
    decode path needs PIL/ffmpeg — absent here, hence the stub gate.
    Repartition first when bodies are large so one Arrow batch fits
    executor memory (at 100 TB: size maxRecordsPerBatch × avg body
    to « executor heap).
    """
    inp = df.repartition(batch_partitions) if batch_partitions else df

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # gate BEFORE iterating: a partition with zero Arrow batches
        # must raise on fake=False exactly like a populated one
        if not fake:
            raise NotImplementedError(
                "media decode requires image/audio libs not present in "
                "this container; pass fake=True for the deterministic stub"
            )
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "media_type", "n_bytes", "sha256",
                     "width", "height", "duration_ms")}
            for r in pdf.itertuples(index=False):
                body = bytes(r.body) if r.body is not None else b""
                w, h, d = _fake_decode(body, r.media_type)
                rows["doc_id"].append(r.doc_id)
                rows["media_type"].append(r.media_type)
                rows["n_bytes"].append(len(body))
                rows["sha256"].append(hashlib.sha256(body).hexdigest())
                rows["width"].append(w)
                rows["height"].append(h)
                rows["duration_ms"].append(d)
            yield pd.DataFrame(rows)

    return inp.mapInPandas(run, schema=MEDIA_META)


RESIZED = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("body", T.BinaryType(), False),
])

FRAMES = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_ms", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), False),
])


def _gate(fake: bool, what: str) -> None:
    if not fake:
        raise NotImplementedError(
            f"{what} requires image/video libs not present in this "
            "container; pass fake=True for the deterministic stub")


def resize_images(df: DataFrame, width: int = 224, height: int = 224,
                  fake: bool = False,
                  batch_partitions: int | None = None) -> DataFrame:
    """Resize binary images to (width, height) via mapInPandas —
    the normalize step before feature extraction. Real path = PIL;
    the deterministic fake stretches a content hash to a fixed-size
    body so downstream schema/row contracts are fully testable."""
    inp = df.repartition(batch_partitions) if batch_partitions else df

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _gate(fake, "image resize")  # before iterating: fires on empty partitions too
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "body": []}
            for r in pdf.itertuples(index=False):
                body = bytes(r.body) if r.body is not None else b""
                h = hashlib.sha256(body).digest()
                out["doc_id"].append(r.doc_id)
                out["width"].append(width)
                out["height"].append(height)
                out["body"].append((h * (width * height // len(h) + 1))
                                   [: width * height])
            yield pd.DataFrame(out)

    return inp.mapInPandas(run, schema=RESIZED)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 8,
                  fake: bool = False,
                  batch_partitions: int | None = None) -> DataFrame:
    """Sample frames from binary video every ``every_ms`` — UDTF shape
    (one video row in, N frame rows out) via mapInPandas. Real path =
    ffmpeg; the fake derives the duration from the content hash (same
    rule as decode_media) and emits hash-derived frame bytes."""
    inp = df.repartition(batch_partitions) if batch_partitions else df

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _gate(fake, "frame sampling")  # before iterating: fires on empty partitions too
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for r in pdf.itertuples(index=False):
                body = bytes(r.body) if r.body is not None else b""
                _, _, dur = _fake_decode(body, "video/mp4")
                n = min(max_frames, max(1, (dur or 0) // every_ms))
                for i in range(int(n)):
                    out["doc_id"].append(r.doc_id)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame"].append(
                        hashlib.sha256(body + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame(out)

    return inp.mapInPandas(run, schema=FRAMES)


def extract_features(df: DataFrame, dim: int = 64, fake: bool = False,
                     batch_partitions: int | None = None) -> DataFrame:
    """Binary media → embedding array<float> — the bridge from
    multimodal payloads into the similarity/near-dup operators
    (cosine top-k, LSH, IVF all consume its output directly). Real
    path = a vision/audio model; the fake derives a deterministic
    unit-free vector from the content hash, so planted duplicate
    payloads land in identical embeddings (tested end-to-end into
    embedding_near_dup)."""
    import numpy as np

    inp = df.repartition(batch_partitions) if batch_partitions else df
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _gate(fake, "feature extraction")  # before iterating: fires on empty partitions too
        for pdf in batches:
            ids, vecs = [], []
            for r in pdf.itertuples(index=False):
                body = bytes(r.body) if r.body is not None else b""
                raw = hashlib.sha256(body).digest()
                buf = (raw * (dim * 4 // len(raw) + 1))[: dim * 4]
                v = (np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
                     / np.float64(1 << 32) * 2.0 - 1.0)
                ids.append(r.doc_id)
                vecs.append([float(x) for x in v])
            yield pd.DataFrame({"doc_id": ids, "embedding": vecs})

    return inp.mapInPandas(run, schema=schema)
