"""Streaming: foreachBatch incremental refresh (delete-then-insert) and the
watermarked windowed rollup, driven hermetically with availableNow."""

import os

import pytest
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.session import load_tables
from vectordb_data_ingestion_spark.sinks.vector_store import ParquetVectorSink
from vectordb_data_ingestion_spark.streaming.incremental import (
    foreach_batch_refresh,
    read_file_stream,
    windowed_event_rollup,
)
from tests.conftest import SF_SMALL


def _catalog_df(spark, version: int, urls):
    rows = [(u, f"content v{version} of {u}", version) for u in urls]
    return spark.createDataFrame(rows, "url string, text string, version int")


def test_incremental_refresh_delete_then_insert(spark, tmp_path):
    stream_dir = str(tmp_path / "incoming")
    sink_dir = str(tmp_path / "vectors")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stream_dir)

    sink = ParquetVectorSink(spark, sink_dir, partition_col=None)

    def transform(batch_df):
        return batch_df.select(
            "url",
            F.sha2(F.concat_ws("#", "url", "text"), 256).alias("chunk_id"),
            "text",
            "version",
        )

    schema = _catalog_df(spark, 1, ["u1"]).schema

    def run_once():
        stream = read_file_stream(spark, stream_dir, schema)
        q = foreach_batch_refresh(
            stream,
            transform,
            sink_upsert=sink.upsert,
            sink_delete_where=sink.delete_where,
            key_col="url",
            checkpoint=ckpt,
        ).start()
        q.awaitTermination(120)

    # batch 1: two documents arrive
    _catalog_df(spark, 1, ["u1", "u2"]).write.mode("append").parquet(stream_dir)
    run_once()
    got = {(r["url"], r["version"]) for r in sink.read().collect()}
    assert got == {("u1", 1), ("u2", 1)}

    # batch 2: u1 updated -> its old rows must be deleted, u3 added
    _catalog_df(spark, 2, ["u1", "u3"]).write.mode("append").parquet(stream_dir)
    run_once()
    got = {(r["url"], r["version"]) for r in sink.read().collect()}
    assert got == {("u1", 2), ("u2", 1), ("u3", 2)}


def test_windowed_rollup_matches_batch(spark, tmp_path):
    events = load_tables(spark, SF_SMALL, ("events",))["events"]
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = read_file_stream(spark, src, events.schema)
    rollup = windowed_event_rollup(stream)
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from rollup_test").collect()
    }

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .collect()
    }
    # append mode only emits windows closed by the final watermark: every
    # emitted window must match the batch result exactly, and the only
    # missing windows are the tail ones within the 2h watermark horizon
    assert streamed, "stream emitted nothing"
    for key, val in streamed.items():
        assert batch[key] == val, key
    max_ts = max(k[0] for k in batch)
    from datetime import timedelta

    for key in set(batch) - set(streamed):
        assert key[0] >= max_ts - timedelta(hours=2), key


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    from vectordb_data_ingestion_spark.operators.sessions import (
        sessionize,
        sessionize_stream,
    )

    events = load_tables(spark, SF_SMALL, ("events",))["events"].filter(
        F.col("user_id") < 20
    )
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)

    stream = read_file_stream(spark, src, events.schema)
    q = (
        sessionize_stream(stream, gap_seconds=86400, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"],
            r["session_start"],
            r["session_end"],
            r["total_value"],
        )
        for r in spark.sql("select * from sessions_test").collect()
    }
    batch = {
        (r["user_id"], r["session_idx"] - 1): (  # batch idx is 1-based
            r["n_events"],
            r["session_start"],
            r["session_end"],
            r["total_value"],
        )
        for r in sessionize(events, gap_seconds=86400).collect()
    }
    assert streamed, "stream emitted no sessions"
    # every emitted (closed) session matches the batch result exactly
    for key, val in streamed.items():
        assert batch[key] == val, key
    # only each user's final (still-open-at-EOS) session may be missing
    missing = set(batch) - set(streamed)
    max_idx = {}
    for u, i in batch:
        max_idx[u] = max(max_idx.get(u, -1), i)
    assert all(i == max_idx[u] for u, i in missing), missing


def test_streaming_exact_dedup(spark, tmp_path):
    """Duplicate texts arriving in different micro-batches are dropped;
    first arrival survives with its payload intact."""
    from datetime import datetime

    from vectordb_data_ingestion_spark.streaming.incremental import (
        read_file_stream,
        streaming_exact_dedup,
    )

    src = tmp_path / "docs_in"
    src.mkdir()
    batch1 = spark.createDataFrame(
        [(1, "alpha beta", datetime(2024, 1, 1, 10, 0)),
         (2, "gamma delta", datetime(2024, 1, 1, 10, 1))],
        "doc_id long, text string, ts timestamp",
    )
    batch2 = spark.createDataFrame(
        [(3, "alpha beta", datetime(2024, 1, 1, 10, 2)),   # dup of doc 1
         (4, "epsilon", datetime(2024, 1, 1, 10, 3))],
        "doc_id long, text string, ts timestamp",
    )
    batch1.coalesce(1).write.mode("append").parquet(str(src))
    batch2.coalesce(1).write.mode("append").parquet(str(src))

    stream = read_file_stream(spark, str(src), batch1.schema, max_files_per_trigger=1)
    deduped = streaming_exact_dedup(stream, text_col="text", ts_col="ts")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, text FROM dedup_out").collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha beta", "epsilon", "gamma delta"]
    # the first arrival of the duplicated content is the survivor
    assert {r["text"]: r["doc_id"] for r in rows}["alpha beta"] == 1
