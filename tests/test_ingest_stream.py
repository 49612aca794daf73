"""Structured Streaming ingest over the persisted DedupState
(ingest.py ingest_stream): a file-source stream drained one file per
micro-batch must produce exactly the serial-model verdicts, the
streaming checkpoint must prevent reprocessing on restart, and a
late-arriving file must flow through as its own idempotent batch —
the foreachBatch + idempotent-sink exactly-once contract."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from news_crawler_spark.ingest import DedupState

from test_ingest_state import BATCHES, _got, serial_model


def _write_batch(src_dir: str, name: str, rows, mtime: int) -> str:
    path = os.path.join(src_dir, f"{name}.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        ),
        path,
    )
    os.utime(path, (mtime, mtime))
    return path


def _drain(st, spark, src_dir, ckpt):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = st.ingest_stream(stream, ckpt)
    q.awaitTermination(300)
    return q


def test_stream_ingest_matches_serial_and_is_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    # one file per logical batch, mtime-ordered so the file source
    # delivers them as separate epochs in b0, b1, b2 order
    epochs = ("b0", "b1", "b2")
    for i, bid in enumerate(epochs):
        _write_batch(str(src), f"{i}_{bid}", BATCHES[bid],
                     1_000_000 + i * 1000)

    st = DedupState(spark, str(tmp_path / "state"))
    _drain(st, spark, str(src), ckpt)

    assert st.committed_batches() == ["stream-0", "stream-1", "stream-2"]
    want = serial_model()
    got = _got(
        st.verdicts.read().select("doc_id", "verdict", "matched_id")
    )
    want_all = {d: v for bid in epochs for d, v in want[bid].items()}
    assert got == want_all

    # restart with the same checkpoint and no new files: nothing
    # reprocessed, state snapshots untouched
    snaps = (
        st.fingerprints.current_snapshot(),
        st.bands.current_snapshot(),
        st.verdicts.current_snapshot(),
    )
    _drain(st, spark, str(src), ckpt)
    assert st.committed_batches() == ["stream-0", "stream-1", "stream-2"]
    assert snaps == (
        st.fingerprints.current_snapshot(),
        st.bands.current_snapshot(),
        st.verdicts.current_snapshot(),
    )

    # a late file becomes its own epoch; its docs verdict against the
    # accumulated state (31 = exact dup of doc 1 from stream-0)
    _write_batch(
        str(src), "9_late", [(31, BATCHES["b0"][0][1]), (32, "late fresh doc")],
        2_000_000,
    )
    _drain(st, spark, str(src), ckpt)
    assert st.committed_batches()[-1] == "stream-3"
    late = _got(
        st.verdicts.read()
        .filter("batch_id = 'stream-3'")
        .select("doc_id", "verdict", "matched_id")
    )
    assert late == {31: ("exact_dup", 1), 32: ("new", None)}
