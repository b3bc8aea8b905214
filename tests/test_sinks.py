"""Sinks: parquet vector substrate (upsert/read/delete_where) and the
batched external-client sink (foreachPartition, batching, backoff retry,
predicate delete) against a file-backed fake client."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.sinks.fake_client import FileBackedClient
from vectordb_data_ingestion_spark.sinks.vector_store import (
    BatchingClientSink,
    ParquetVectorSink,
)


def _chunk_df(spark, n=10):
    rows = [
        (f"chunk{i:03d}", [float(i), 1.0], f"doc{i % 3}", f"text {i}", "2024-01-01")
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "chunk_id string, vector array<double>, url string, text string, load_dt string",
    )


def test_parquet_sink_roundtrip_and_delete(spark, tmp_path):
    sink = ParquetVectorSink(spark, str(tmp_path / "vectors"))
    sink.upsert(_chunk_df(spark))
    assert sink.read().count() == 10

    sink.delete_where("url", ["doc0"])
    remaining = sink.read()
    assert remaining.count() == 6
    assert remaining.filter(F.col("url") == "doc0").count() == 0

    # delete-then-insert refresh: re-add doc0 rows
    sink.upsert(_chunk_df(spark).filter(F.col("url") == "doc0"))
    assert sink.read().count() == 10


def test_batching_sink_upsert(spark, tmp_path):
    base = str(tmp_path / "store")
    os.makedirs(base)
    sink = BatchingClientSink(
        lambda: FileBackedClient(base), "Chunks", batch_size=3
    )
    sink.ensure_class([{"name": "text"}, {"name": "url"}])
    sink.upsert(_chunk_df(spark).repartition(2), property_cols=["url", "text"])

    objs = FileBackedClient.read_objects(base)
    assert len(objs) == 10
    assert {o["id"] for o in objs} == {f"chunk{i:03d}" for i in range(10)}
    assert all(isinstance(o["vector"], list) for o in objs)
    # batching respected: no file holds more than batch_size objects
    for fp in glob.glob(os.path.join(base, "batch_*.jsonl")):
        assert len(open(fp).readlines()) <= 3
    assert os.path.exists(os.path.join(base, "_class_Chunks"))


def test_batching_sink_retries_transient_failures(spark, tmp_path):
    base = str(tmp_path / "flaky")
    os.makedirs(base)
    sink = BatchingClientSink(
        lambda: FileBackedClient(base, fail_first=2),
        "Chunks",
        batch_size=100,
        max_retries=5,
    )
    sink.upsert(_chunk_df(spark).coalesce(1), property_cols=["url"])
    assert len(FileBackedClient.read_objects(base)) == 10


def test_batching_sink_delete_where(spark, tmp_path):
    base = str(tmp_path / "del")
    os.makedirs(base)
    sink = BatchingClientSink(lambda: FileBackedClient(base), "Chunks", batch_size=4)
    sink.upsert(_chunk_df(spark).coalesce(1), property_cols=["url", "text"])
    sink.delete_where("url", ["doc1", "doc2"])
    objs = FileBackedClient.read_objects(base)
    assert {o["properties"]["url"] for o in objs} == {"doc0"}


def test_vector_store_datasource_writer_commit_protocol(spark, tmp_path):
    """Two-phase load: rows spool per task, the manifest publishes them
    atomically on commit; orphaned spool files stay invisible; append
    grows the manifest."""
    import json
    import os

    from vectordb_data_ingestion_spark.sinks.datasource_writer import (
        VectorStoreDataSource,
        read_committed,
    )

    spark.dataSource.register(VectorStoreDataSource)
    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(f"c{i}", f"text {i}", [float(i), 0.5]) for i in range(10)],
        ["chunk_id", "text", "vector"],
    ).repartition(3)
    df.write.format("vector_store").option("path", path).option(
        "class_name", "KB"
    ).mode("append").save()

    rows = read_committed(path)
    assert len(rows) == 10
    assert {r["chunk_id"] for r in rows} == {f"c{i}" for i in range(10)}
    assert all(r["class"] == "KB" for r in rows)
    assert rows[0]["vector"] is not None

    # an orphaned spool file (in-flight/aborted task) is NOT visible
    orphan = os.path.join(path, "_spool", "orphan.jsonl")
    with open(orphan, "w") as f:
        f.write(json.dumps({"class": "KB", "chunk_id": "ghost"}) + "\n")
    assert {r["chunk_id"] for r in read_committed(path)} == {
        f"c{i}" for i in range(10)
    }

    # append mode: second load extends the manifest
    df.limit(2).write.format("vector_store").option("path", path).mode(
        "append"
    ).save()
    assert len(read_committed(path)) == 12

    # abort() removes spooled-but-uncommitted files
    from vectordb_data_ingestion_spark.sinks.datasource_writer import (
        VectorStoreWriter,
        _SpoolCommit,
    )

    w = VectorStoreWriter({"path": path}, overwrite=False)
    with open(os.path.join(path, "_spool", "doomed.jsonl"), "w") as f:
        f.write("{}\n")
    w.abort([_SpoolCommit(filename="doomed.jsonl", n_rows=1), None])
    assert not os.path.exists(os.path.join(path, "_spool", "doomed.jsonl"))


def test_vector_store_writer_overwrite_retires_spool_and_vacuum(spark, tmp_path):
    import os

    from vectordb_data_ingestion_spark.sinks.datasource_writer import (
        VectorStoreDataSource,
        read_committed,
        vacuum,
    )

    spark.dataSource.register(VectorStoreDataSource)
    path = str(tmp_path / "store2")
    df = spark.createDataFrame([(f"c{i}",) for i in range(4)], ["chunk_id"])
    df.write.format("vector_store").option("path", path).mode("append").save()
    first_files = set(os.listdir(os.path.join(path, "_spool")))
    # overwrite: manifest rewritten AND prior spool files retired
    df.limit(2).write.format("vector_store").option("path", path).mode(
        "overwrite"
    ).save()
    assert len(read_committed(path)) == 2
    remaining = set(os.listdir(os.path.join(path, "_spool")))
    assert not (first_files & remaining)
    # vacuum removes orphans (dead-task leftovers) but not committed files
    with open(os.path.join(path, "_spool", "orphan.jsonl"), "w") as f:
        f.write("{}\n")
    assert vacuum(path) == 1
    assert len(read_committed(path)) == 2


def test_vector_store_concurrent_append_commits_lossless(tmp_path):
    # regression (ADVICE r5): append-mode commit is read-modify-replace; two
    # jobs committing to the same sink path concurrently raced, the loser's
    # manifest lines vanished, and vacuum() then deleted its committed spool
    # files. The flock sidecar makes the section mutually exclusive.
    import threading

    from vectordb_data_ingestion_spark.sinks.datasource_writer import (
        VectorStoreWriter,
        _SpoolCommit,
        read_committed,
        vacuum,
    )

    path = str(tmp_path / "store_conc")
    os.makedirs(os.path.join(path, "_spool"), exist_ok=True)
    n_threads, n_commits = 4, 25

    def run(tid):
        w = VectorStoreWriter({"path": path}, overwrite=False)
        for i in range(n_commits):
            fname = f"t{tid}_{i}.jsonl"
            with open(os.path.join(path, "_spool", fname), "w") as f:
                f.write('{"class": "Chunk", "chunk_id": "%s"}\n' % fname)
            w.commit([_SpoolCommit(filename=fname, n_rows=1)])

    threads = [threading.Thread(target=run, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    rows = read_committed(path)
    assert len(rows) == n_threads * n_commits
    # and vacuum must not remove any committed file
    assert vacuum(path) == 0
    assert len(read_committed(path)) == n_threads * n_commits


def test_overwrite_commit_spares_inflight_spool(tmp_path):
    # review r6: overwrite used to retire EVERY spool file not in the new
    # manifest — including a concurrent job's spooled-but-uncommitted
    # file, whose commit then published lines for deleted files. Only
    # files the PREVIOUS manifest listed may be retired.
    from vectordb_data_ingestion_spark.sinks.datasource_writer import (
        VectorStoreWriter,
        _SpoolCommit,
        read_committed,
    )

    path = str(tmp_path / "store_inflight")
    spool = os.path.join(path, "_spool")
    os.makedirs(spool, exist_ok=True)

    def spool_file(fname):
        with open(os.path.join(spool, fname), "w") as f:
            f.write('{"class": "Chunk", "chunk_id": "%s"}\n' % fname)

    appender = VectorStoreWriter({"path": path}, overwrite=False)
    spool_file("old.jsonl")
    appender.commit([_SpoolCommit(filename="old.jsonl", n_rows=1)])
    spool_file("inflight.jsonl")  # another job's task: spooled, uncommitted

    overwriter = VectorStoreWriter({"path": path}, overwrite=True)
    spool_file("new.jsonl")
    overwriter.commit([_SpoolCommit(filename="new.jsonl", n_rows=1)])

    # the prior load is retired, the in-flight file survives
    assert not os.path.exists(os.path.join(spool, "old.jsonl"))
    assert os.path.exists(os.path.join(spool, "inflight.jsonl"))
    assert [r["chunk_id"] for r in read_committed(path)] == ["new.jsonl"]

    # ...so the in-flight job's own commit still lands intact
    appender.commit([_SpoolCommit(filename="inflight.jsonl", n_rows=1)])
    assert sorted(r["chunk_id"] for r in read_committed(path)) == [
        "inflight.jsonl", "new.jsonl",
    ]


def test_delete_where_df_matches_list_form(spark, tmp_path):
    """The anti-join delete (keys stay distributed) removes exactly the
    same rows as the driver-list form — the streaming refresh can swap
    one for the other when a micro-batch carries too many keys to
    collect."""
    from vectordb_data_ingestion_spark.sinks.vector_store import (
        ParquetVectorSink,
    )

    rows = [(i, f"text {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    a = ParquetVectorSink(spark, str(tmp_path / "a"), partition_col=None)
    b = ParquetVectorSink(spark, str(tmp_path / "b"), partition_col=None)
    a.upsert(df)
    b.upsert(df)

    kill = [3, 7, 11, 39]
    a.delete_where("doc_id", kill)
    b.delete_where_df(
        "doc_id", spark.createDataFrame([(k,) for k in kill], "k long")
    )
    got_a = sorted(r["doc_id"] for r in a.read().collect())
    got_b = sorted(r["doc_id"] for r in b.read().collect())
    assert got_a == got_b == [i for i in range(40) if i not in kill]

    # before the sink exists: both forms are no-ops, not errors
    fresh = ParquetVectorSink(spark, str(tmp_path / "c"), partition_col=None)
    fresh.delete_where("doc_id", [1])
    fresh.delete_where_df(
        "doc_id", spark.createDataFrame([(1,)], "k long")
    )


def test_parquet_sink_rewrite_crash_recovery(spark, tmp_path):
    """Review r5: the old rmtree-then-move rewrite had a crash window as
    wide as the delete itself — a replaying micro-batch would then
    silently rebuild the sink from only the latest batch. Pin the three
    recoverable crash states of the new write/rename/rename/delete swap."""
    import shutil

    base = str(tmp_path / "v")
    sink = ParquetVectorSink(spark, base, partition_col=None)
    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(6)], "chunk_id long, url string"
    )
    sink.upsert(df)

    # state 1: crash between the two renames — base gone, completed
    # rewrite stranded in __rewrite. Recovery must finish the swap.
    shutil.move(base, base + "__rewrite")
    assert ParquetVectorSink(spark, base, partition_col=None).read().count() == 6

    # state 2: crash mid-write — partial __rewrite next to an intact
    # base. Recovery must discard the partial and keep base.
    import os

    os.makedirs(base + "__rewrite")
    with open(base + "__rewrite/part-partial.parquet", "w") as fh:
        fh.write("garbage")
    s2 = ParquetVectorSink(spark, base, partition_col=None)
    assert not os.path.exists(base + "__rewrite")
    assert s2.read().count() == 6

    # state 3: crash after the swap, before old-copy cleanup — __old
    # lingers. Recovery must retire it and keep base.
    shutil.copytree(base, base + "__old")
    s3 = ParquetVectorSink(spark, base, partition_col=None)
    assert not os.path.exists(base + "__old")
    assert s3.read().count() == 6

    # NULL-keyed rows survive a list-form delete (parity with the
    # anti-join form)
    withnull = spark.createDataFrame(
        [(100, None)], "chunk_id long, url string"
    )
    s3.upsert(withnull)
    s3.delete_where("url", ["u0", "u1"])
    left = s3.read()
    assert left.count() == 5  # 6 - 2 deleted + 1 null-keyed kept
    assert left.filter(F.col("url").isNull()).count() == 1


def _bucketed(spark, tmp_path, name="bk", n=8):
    return ParquetVectorSink(
        spark, str(tmp_path / name), partition_col=None,
        key_col="chunk_id", n_buckets=n,
    )


def test_bucketed_sink_roundtrip_and_pruned_delete(spark, tmp_path):
    """Bucketed layout: rows land under pbucket=hash(key)%N, read() hides
    the layout column, and a key delete rewrites ONLY the buckets its keys
    hash into — verified by mtime: untouched bucket dirs keep their files.
    Both delete forms (list and DataFrame) share the bucketed path."""
    import os

    sink = _bucketed(spark, tmp_path)
    rows = [(f"c{i}", f"text {i}", [float(i)]) for i in range(40)]
    df = spark.createDataFrame(
        rows, "chunk_id string, text string, vector array<float>"
    )
    sink.upsert(df)
    base = str(tmp_path / "bk")
    dirs = sorted(d for d in os.listdir(base) if d.startswith("pbucket="))
    assert len(dirs) > 1
    assert sorted(sink.read().columns) == ["chunk_id", "text", "vector"]
    assert sink.read().count() == 40

    from pyspark.sql import functions as F

    victim = "c7"
    vb = df.filter(F.col("chunk_id") == victim).select(
        F.pmod(F.xxhash64("chunk_id"), F.lit(8)).cast("int")
    ).first()[0]
    before = {
        d: sorted(os.listdir(os.path.join(base, d))) for d in dirs
    }
    sink.delete_where("chunk_id", [victim])
    after_rows = sink.read()
    assert after_rows.count() == 39
    assert after_rows.filter(F.col("chunk_id") == victim).count() == 0
    for d in dirs:
        bucket = int(d.split("=")[1])
        if bucket != vb:
            assert sorted(
                os.listdir(os.path.join(base, d))
            ) == before[d], f"untouched bucket {d} was rewritten"

    # DataFrame form: deleting EVERY row retires the base dir entirely (an
    # emptied sink returns to the not-yet-created state) and a fresh
    # upsert recreates it
    all_keys = spark.createDataFrame([(k,) for k, _t, _v in rows], ["chunk_id"])
    sink.delete_where_df("chunk_id", all_keys)
    assert not os.path.exists(base)
    sink.upsert(df.limit(3))
    assert sink.read().count() == 3


def test_bucketed_delete_crash_recovery(spark, tmp_path):
    """The _BUCKET_SWAP manifest is the commit point: an uncommitted
    staging dir is discarded (delete never happened), a committed one
    rolls forward from any rename crash point — including the
    staged-but-not-yet-swapped and half-swapped states."""
    import os
    import shutil

    sink = _bucketed(spark, tmp_path, name="ck")
    df = spark.createDataFrame(
        [(f"c{i}", i) for i in range(30)], "chunk_id string, v long"
    )
    sink.upsert(df)
    base = str(tmp_path / "ck")
    staging = base + "__rewrite"

    # crash BEFORE the manifest: staging exists, no commit -> discarded
    os.makedirs(staging, exist_ok=True)
    with open(os.path.join(staging, "_partial"), "w") as fh:
        fh.write("junk")
    s2 = _bucketed(spark, tmp_path, name="ck")
    assert not os.path.exists(staging)
    assert s2.read().count() == 30

    # committed manifest, crash before ANY rename: reopen rolls forward
    s2.delete_where_df(
        "chunk_id", spark.createDataFrame([("c3",), ("c4",)], ["chunk_id"])
    )
    assert s2.read().count() == 28

    # simulate the mid-swap crash: re-create a committed staging whose
    # keep-bucket was already swapped (staging dir gone) and whose drop
    # bucket still exists in base — roll-forward must be idempotent and
    # must NOT delete the already-swapped keep bucket's new data
    from pyspark.sql import functions as F

    vb = spark.createDataFrame([("c5",)], ["chunk_id"]).select(
        F.pmod(F.xxhash64("chunk_id"), F.lit(8)).cast("int")
    ).first()[0]
    os.makedirs(staging, exist_ok=True)
    with open(os.path.join(staging, "_BUCKET_SWAP"), "w") as fh:
        fh.write(f"{vb} keep")  # keep-bucket, staging dir already consumed
    kept_dir = os.path.join(base, f"pbucket={vb}")
    kept_before = sorted(os.listdir(kept_dir)) if os.path.isdir(kept_dir) else None
    s3 = _bucketed(spark, tmp_path, name="ck")
    assert not os.path.exists(staging)
    if kept_before is not None:
        assert sorted(os.listdir(kept_dir)) == kept_before
    assert s3.read().count() == 28
    shutil.rmtree(base)


def test_bucketed_delete_refuses_unbucketed_layout(spark, tmp_path):
    plain = ParquetVectorSink(
        spark, str(tmp_path / "flat"), partition_col=None
    )
    plain.upsert(
        spark.createDataFrame([("a", 1)], "chunk_id string, v long")
    )
    bucketed = ParquetVectorSink(
        spark, str(tmp_path / "flat"), partition_col=None,
        key_col="chunk_id", n_buckets=4,
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="unbucketed"):
        bucketed.delete_where_df(
            "chunk_id", spark.createDataFrame([("a",)], ["chunk_id"])
        )


def test_sink_mutations_serialize_on_flock(spark, tmp_path):
    """Two writers on one sink path must serialize: while one holds the
    mutation lock, another's delete blocks instead of racing the shared
    __rewrite staging (the lost-commit class the datasource writer's
    flock closes)."""
    import threading
    import time

    sink = ParquetVectorSink(spark, str(tmp_path / "locked"), partition_col=None)
    sink.upsert(
        spark.createDataFrame([("a", 1), ("b", 2)], "chunk_id string, v long")
    )
    order = []

    def contender():
        order.append("contender-start")
        sink.delete_where("chunk_id", ["a"])
        order.append("contender-done")

    with sink._locked():
        t = threading.Thread(target=contender)
        t.start()
        time.sleep(1.5)  # the delete must still be blocked on the flock
        order.append("holder-release")
    t.join(60)
    assert order == ["contender-start", "holder-release", "contender-done"]
    assert {r["chunk_id"] for r in sink.read().collect()} == {"b"}


def test_bucketed_delete_casts_key_type_to_stored(spark, tmp_path):
    """xxhash64 is TYPE-sensitive: hash(1 as int) != hash(1 as long). A
    sink whose key column was stored as int, deleted with Python ints
    (createDataFrame infers LongType), used to prune the WRONG buckets
    and silently delete nothing. The key set must be cast to the stored
    key type before bucket pruning (ADVICE r6)."""
    sink = ParquetVectorSink(
        spark, str(tmp_path / "intkey"), partition_col=None,
        key_col="doc_id", n_buckets=8,
    )
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id int, text string"
    )
    sink.upsert(df)
    assert sink.read().count() == 40

    # list form (values infer LongType on the way in)
    sink.delete_where("doc_id", [7, 11])
    remaining = sink.read()
    assert remaining.count() == 38
    assert remaining.filter(F.col("doc_id").isin(7, 11)).count() == 0

    # DataFrame form with an explicitly LongType key set
    keys = spark.createDataFrame([(13,), (17,)], "doc_id long")
    sink.delete_where_df("doc_id", keys)
    remaining = sink.read()
    assert remaining.count() == 36
    assert remaining.filter(F.col("doc_id").isin(13, 17)).count() == 0


def test_upsert_refuses_mismatched_bucket_layout(spark, tmp_path):
    """A bucketed-configured sink must not append pbucket= files into an
    existing unbucketed store (mixed partition layouts break every later
    read), and vice versa — the same error delete raises, but at WRITE
    time (ADVICE r6)."""
    df = spark.createDataFrame([("a", 1)], "chunk_id string, v long")

    plain = ParquetVectorSink(spark, str(tmp_path / "mix"), partition_col=None)
    plain.upsert(df)
    bucketed = ParquetVectorSink(
        spark, str(tmp_path / "mix"), partition_col=None,
        key_col="chunk_id", n_buckets=4,
    )
    with pytest.raises(RuntimeError, match="unbucketed"):
        bucketed.upsert(df)

    bsink = ParquetVectorSink(
        spark, str(tmp_path / "mix2"), partition_col=None,
        key_col="chunk_id", n_buckets=4,
    )
    bsink.upsert(df)
    plain2 = ParquetVectorSink(
        spark, str(tmp_path / "mix2"), partition_col=None
    )
    with pytest.raises(RuntimeError, match="hash-bucketed"):
        plain2.upsert(df)

    # the original stores are intact after the refused writes
    assert plain.read().count() == 1
    assert bsink.read().count() == 1


def test_unbucketed_open_delete_preserves_bucket_layout(spark, tmp_path):
    """The documented inspection hatch (open a bucketed store with
    n_buckets=0) must not let a non-key delete's rewrite FLATTEN the
    pbucket layout: the rewrite partitions by whatever layout columns the
    data carries, so a later bucketed open still prunes correctly."""
    import os

    bucketed = _bucketed(spark, tmp_path, name="keep")
    bucketed.upsert(
        spark.createDataFrame(
            [(f"c{i}", "old" if i < 10 else "new") for i in range(20)],
            "chunk_id string, tag string",
        )
    )
    plain = ParquetVectorSink(
        spark, str(tmp_path / "keep"), partition_col=None
    )
    plain.delete_where("tag", ["old"])
    base = str(tmp_path / "keep")
    assert any(d.startswith("pbucket=") for d in os.listdir(base)), (
        "layout flattened by the unbucketed rewrite"
    )
    # bucketed reopen still works end-to-end, including a pruned delete
    again = _bucketed(spark, tmp_path, name="keep")
    assert again.read().count() == 10
    again.delete_where("chunk_id", ["c15"])
    assert again.read().count() == 9


def test_partition_drop_fast_path(spark, tmp_path):
    """delete_where on the partition column drops the matching load_dt
    dirs directly (rename-to-trash + remove) — no scan, no rewrite: the
    untouched partitions' files are bit-identical afterwards. Works
    through the bucketed layout too, sweeps stranded trash on reopen,
    and retires an emptied sink."""
    import os

    base = str(tmp_path / "ret")
    sink = ParquetVectorSink(spark, base)  # partition_col="load_dt" default
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01"), ("b", "2024-01-01"),
            ("c", "2024-01-02"), ("d", "2024-01-03"),
        ],
        "chunk_id string, load_dt string",
    )
    sink.upsert(df)
    kept_dir = os.path.join(base, "load_dt=2024-01-02")
    before = sorted(os.listdir(kept_dir))
    sink.delete_where("load_dt", ["2024-01-01", None])
    got = {(r["chunk_id"], str(r["load_dt"])) for r in sink.read().collect()}
    assert got == {("c", "2024-01-02"), ("d", "2024-01-03")}
    assert sorted(os.listdir(kept_dir)) == before  # untouched bytes

    # stranded trash from a simulated crash is swept on reopen
    os.makedirs(base + "__trash_deadbeef")
    ParquetVectorSink(spark, base)
    assert not os.path.exists(base + "__trash_deadbeef")

    # dropping everything retires the sink (husk rule)
    sink.delete_where("load_dt", ["2024-01-02", "2024-01-03"])
    assert not os.path.exists(base)
    sink.upsert(df.limit(1))
    assert sink.read().count() == 1

    # composed with buckets: load_dt dirs live one level down
    bsink = ParquetVectorSink(
        spark, str(tmp_path / "retbk"), partition_col="load_dt",
        key_col="chunk_id", n_buckets=4,
    )
    bsink.upsert(df)
    bsink.delete_where("load_dt", ["2024-01-01"])
    got = {r["chunk_id"] for r in bsink.read().collect()}
    assert got == {"c", "d"}
    bsink.delete_where("chunk_id", ["c"])  # key pruning still works after
    assert {r["chunk_id"] for r in bsink.read().collect()} == {"d"}


def test_parquet_sink_randomized_against_model(spark, tmp_path):
    """Model-based drill, rename-protocol edition (the manifest sink has
    its own in test_manifest_sink.py): a seeded random mutation sequence
    against the bucketed parquet sink and an in-memory multiset model in
    lockstep — upserts, key deletes (list + DataFrame forms), partition
    drops — visible rows must equal the model after every step."""
    import random

    rng = random.Random(20260817)
    sink = ParquetVectorSink(
        spark, str(tmp_path / "model"), partition_col="load_dt",
        key_col="k", n_buckets=4,
    )
    model: list[tuple[str, str]] = []  # multiset of (k, load_dt)
    dts = ["d1", "d2", "d3"]

    for step in range(14):
        op = rng.choice(["upsert", "upsert", "delete_key", "delete_df",
                         "drop_partition"])
        if op == "upsert":
            rows = [
                (f"k{rng.randrange(10)}", rng.choice(dts))
                for _ in range(rng.randrange(1, 5))
            ]
            sink.upsert(
                spark.createDataFrame(rows, "k string, load_dt string")
            )
            model.extend(rows)
        elif op in ("delete_key", "delete_df") and model:
            keys = [f"k{rng.randrange(10)}" for _ in range(rng.randrange(1, 3))]
            if op == "delete_key":
                sink.delete_where("k", keys)
            else:
                sink.delete_where_df(
                    "k", spark.createDataFrame([(x,) for x in keys], ["k"])
                )
            model = [r for r in model if r[0] not in set(keys)]
        elif op == "drop_partition" and model:
            dt = rng.choice(dts)
            sink.delete_where("load_dt", [dt])
            model = [r for r in model if r[1] != dt]
        if model:
            got = sorted(
                (r["k"], str(r["load_dt"])) for r in sink.read().collect()
            )
            assert got == sorted(model), f"diverged at step {step} ({op})"


def test_partition_drop_fast_path_checks_layout(spark, tmp_path):
    """ADVICE r7: the partition-delete fast path must run the same layout
    gate as upsert — a bucketed sink opened over an unbucketed store
    would otherwise scan only (nonexistent) pbucket= parents and silently
    delete nothing."""
    plain = ParquetVectorSink(
        spark, str(tmp_path / "flat"), partition_col="load_dt"
    )
    plain.upsert(
        spark.createDataFrame(
            [("a", "2024-01-01"), ("b", "2024-01-02")],
            "chunk_id string, load_dt string",
        )
    )
    bucketed = ParquetVectorSink(
        spark, str(tmp_path / "flat"), partition_col="load_dt",
        key_col="chunk_id", n_buckets=4,
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="unbucketed"):
        bucketed.delete_where("load_dt", ["2024-01-01"])
    # nothing was silently dropped
    assert plain.read().count() == 2


@pytest.mark.parametrize(
    "schema,rows,kill,keep_ids",
    [
        (
            "chunk_id string, pcol boolean",
            [("a", True), ("b", False), ("c", True)],
            [True],
            {"b"},
        ),
        (
            "chunk_id string, pcol date",
            [
                ("a", __import__("datetime").date(2024, 1, 1)),
                ("b", __import__("datetime").date(2024, 1, 2)),
            ],
            [__import__("datetime").date(2024, 1, 1)],
            {"b"},
        ),
        (
            "chunk_id string, pcol timestamp",
            [
                ("a", __import__("datetime").datetime(2024, 1, 1, 10, 30)),
                ("b", __import__("datetime").datetime(2024, 1, 2, 11, 0)),
            ],
            [__import__("datetime").datetime(2024, 1, 1, 10, 30)],
            {"b"},
        ),
        (
            "chunk_id string, pcol decimal(10,2)",
            [
                ("a", __import__("decimal").Decimal("1.50")),
                ("b", __import__("decimal").Decimal("2.25")),
            ],
            [__import__("decimal").Decimal("1.5")],  # non-canonical render
            {"b"},
        ),
    ],
    ids=["bool", "date", "timestamp", "decimal"],
)
def test_partition_drop_fast_path_type_faithful(
    spark, tmp_path, schema, rows, kill, keep_ids
):
    """VERDICT r7 defect 1: the retention fast path must delete exactly
    the rows the anti-join rewrite would. str(True)='True' vs the Hive
    dir 'pcol=true' (and Decimal('1.5') vs a scale-2 '1.50' dir) used to
    make the fast path a silent no-op on non-canonically-rendered types.
    Values now render through the stored column type, pinning fast-path
    ≡ rewrite-path on bool, date, timestamp and decimal partition
    columns — on BOTH sinks."""
    from vectordb_data_ingestion_spark.sinks.manifest_sink import (
        ManifestVectorSink,
    )

    df = spark.createDataFrame(rows, schema)

    # POSIX sink: fast path (public API) vs the anti-join rewrite (twin)
    fast = ParquetVectorSink(spark, str(tmp_path / "fast"), partition_col="pcol")
    fast.upsert(df)
    fast.delete_where("pcol", kill)
    got_fast = {r["chunk_id"] for r in fast.read().collect()}
    assert got_fast == keep_ids

    twin = ParquetVectorSink(spark, str(tmp_path / "twin"), partition_col="pcol")
    twin.upsert(df)
    with twin._locked():
        twin._delete_where_unbucketed("pcol", kill)
    got_twin = {r["chunk_id"] for r in twin.read().collect()}
    assert got_fast == got_twin

    # manifest sink: fast path (manifest edit) vs delete_where_df
    mfast = ManifestVectorSink(
        spark, str(tmp_path / "mfast"), partition_col="pcol"
    )
    mfast.upsert(df)
    mfast.delete_where("pcol", kill)
    got_mfast = {r["chunk_id"] for r in mfast.read().collect()}
    assert got_mfast == keep_ids

    mtwin = ManifestVectorSink(
        spark, str(tmp_path / "mtwin"), partition_col="pcol"
    )
    mtwin.upsert(df)
    mtwin.delete_where_df(
        "pcol", spark.createDataFrame([(v,) for v in kill], ["pcol"])
    )
    got_mtwin = {r["chunk_id"] for r in mtwin.read().collect()}
    assert got_mfast == got_mtwin


def test_partition_drop_fallback_is_rewrite_not_str_compare(
    spark, tmp_path, monkeypatch
):
    """ADVICE r8 (low) / VERDICT r8 item 3: when the typed matching path
    fails (stored type unresolvable, transient Spark failure in the
    matching projection), the fast path must degrade to the EXACT
    anti-join/rewrite delete — never to the str(v) dir-name compare the
    r8 fix retired, which silently no-ops bool partition deletes
    (str(True)='True' vs the 'pcol=true' dir). Forces the exception
    branch on a bool-typed partition column and asserts the rows are
    actually deleted, on BOTH sinks, with a diagnosable warning."""
    from vectordb_data_ingestion_spark.sinks import vector_store as vs_mod
    from vectordb_data_ingestion_spark.sinks.manifest_sink import (
        ManifestVectorSink,
    )

    def boom(*a, **kw):
        raise RuntimeError("simulated transient matching failure")

    df = spark.createDataFrame(
        [("a", True), ("b", False), ("c", True)],
        "chunk_id string, pcol boolean",
    )

    # POSIX sink: _drop_partition_dirs resolves the name at module level
    monkeypatch.setattr(vs_mod, "match_partition_dir_values", boom)
    sink = ParquetVectorSink(
        spark, str(tmp_path / "posix"), partition_col="pcol"
    )
    sink.upsert(df)
    with pytest.warns(RuntimeWarning, match="falling back"):
        sink.delete_where("pcol", [True])
    assert {r["chunk_id"] for r in sink.read().collect()} == {"b"}

    # manifest sink: _drop_partitions imports the same helper from
    # vector_store inside the function body — already patched above
    msink = ManifestVectorSink(
        spark, str(tmp_path / "manifest"), partition_col="pcol"
    )
    msink.upsert(df)
    with pytest.warns(RuntimeWarning, match="falling back"):
        msink.delete_where("pcol", [True])
    assert {r["chunk_id"] for r in msink.read().collect()} == {"b"}


def test_none_in_delete_values_never_mass_deletes(
    spark, tmp_path, monkeypatch
):
    """ADVICE r9 (medium): a None in the delete VALUE list must behave
    as the documented NULL-skip (equality deletes never match NULL) on
    EVERY path. The dangerous path is ~isin(): `x IN (a, NULL)` is NULL
    — not false — for every x != a, so the rewrite filter
    `~isin | isNull` drops ALL non-matching non-null rows, a mass
    delete. Exercised three ways: the direct unbucketed rewrite, the
    partition fast path forced onto its rewrite fallback (the exact
    ADVICE scenario: match_partition_dir_values raises transiently while
    values carries a None), and the all-None no-op edge on both sinks."""
    from vectordb_data_ingestion_spark.sinks import vector_store as vs_mod
    from vectordb_data_ingestion_spark.sinks.manifest_sink import (
        ManifestVectorSink,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", None)],
        "chunk_id string, pcol string",
    )

    # direct unbucketed rewrite with a None in the list: only the
    # matching row dies; the NULL-keyed row and non-matching rows live
    sink = ParquetVectorSink(spark, str(tmp_path / "direct"))
    sink.upsert(df)
    sink.delete_where("pcol", ["x", None])
    assert {r["chunk_id"] for r in sink.read().collect()} == {"b", "c"}

    # all-None list: deletes nothing on either sink (and must not crash
    # DataFrame type inference on the anti-join paths)
    sink.delete_where("pcol", [None])
    assert {r["chunk_id"] for r in sink.read().collect()} == {"b", "c"}
    msink = ManifestVectorSink(spark, str(tmp_path / "mnone"))
    msink.upsert(df)
    msink.delete_where("pcol", [None])
    assert {r["chunk_id"] for r in msink.read().collect()} == {"a", "b", "c"}

    # the ADVICE scenario verbatim: partitioned sink, fast path raises
    # transiently, values = ['x', None] → fallback rewrite must keep
    # every non-matching row (pre-fix it kept none)
    def boom(*a, **kw):
        raise RuntimeError("simulated transient matching failure")

    monkeypatch.setattr(vs_mod, "match_partition_dir_values", boom)
    psink = ParquetVectorSink(
        spark, str(tmp_path / "pfall"), partition_col="pcol"
    )
    psink.upsert(df)
    with pytest.warns(RuntimeWarning, match="falling back"):
        psink.delete_where("pcol", ["x", None])
    assert {r["chunk_id"] for r in psink.read().collect()} == {"b", "c"}

    mpsink = ManifestVectorSink(
        spark, str(tmp_path / "mpfall"), partition_col="pcol"
    )
    mpsink.upsert(df)
    with pytest.warns(RuntimeWarning, match="falling back"):
        mpsink.delete_where("pcol", ["x", None])
    assert {r["chunk_id"] for r in mpsink.read().collect()} == {"b", "c"}
