"""Incremental refresh via Structured Streaming.

The reference's incremental path (E2: data_ingestion.py:56-60 +
find_new_and_updated_files + delete_filedata_from_vectordb) is a manual
diff-then-delete-then-insert. Streaming-native equivalent:

- a file-source stream watches the catalog/drop directory; every new file
  becomes a micro-batch,
- ``foreach_batch_refresh`` runs the delete-then-insert against the vector
  sink per batch (delete stale chunk rows for the batch's urls, append the
  re-chunked/re-embedded rows) - exactly the reference's refresh contract
  but incremental, checkpointed, and restartable,
- ``windowed_event_rollup`` is the watermarked tumbling-window aggregate
  (late data handled by the watermark instead of full recomputation).

Tests drive both with ``trigger(availableNow=True)`` for hermetic one-shot
runs; a deployment would run them continuously with checkpoints.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def refresh_batch_fn(
    transform: Callable[[DataFrame], DataFrame],
    sink_upsert: Callable[[DataFrame], None],
    sink_delete_where: Callable[[str, list], None],
    key_col: str,
    sink_delete_where_df: Callable[[str, DataFrame], None] | None | str = (
        "auto"
    ),
) -> Callable[[DataFrame, int], None]:
    """Per-micro-batch delete-then-insert (the body of
    ``foreach_batch_refresh``, exposed so replay tests can re-run a batch
    with the same batch_id):

    1. ``sink_delete_where_df(key_col, keys_df)`` clears stale rows with
       the key set kept DISTRIBUTED (delete_filedata_from_vectordb
       semantics, broadcast anti-join form),
    2. ``transform`` re-derives the chunk/vector rows,
    3. ``sink_upsert`` appends them.

    Replay-idempotent: a retried batch first deletes its keys — including
    any rows its crashed first attempt already appended — then re-inserts.

    ``sink_delete_where_df`` defaults to ``"auto"``: when
    ``sink_delete_where`` is a bound method of a sink that also exposes
    ``delete_where_df`` (``ParquetVectorSink`` does), the distributed
    form is used — a backfill micro-batch carrying millions of changed
    documents must never funnel its key set through the driver. The
    key-LIST path (collect distinct keys, pass a Python list) runs only
    for client sinks that cannot accept a DataFrame (e.g. a remote
    vector-DB predicate-delete API, which is catalog-sized by contract);
    pass ``sink_delete_where_df=None`` to force it explicitly.
    """
    if sink_delete_where_df == "auto":
        owner = getattr(sink_delete_where, "__self__", None)
        sink_delete_where_df = getattr(owner, "delete_where_df", None)

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if sink_delete_where_df is not None:
            sink_delete_where_df(key_col, batch_df.select(key_col))
        else:
            keys = [
                r[0] for r in batch_df.select(key_col).distinct().collect()
            ]
            sink_delete_where(key_col, keys)
        sink_upsert(transform(batch_df))

    return run_batch


def foreach_batch_refresh(
    stream_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    sink_upsert: Callable[[DataFrame], None],
    sink_delete_where: Callable[[str, list], None],
    key_col: str,
    checkpoint: str,
    sink_delete_where_df: Callable[[str, DataFrame], None] | None | str = (
        "auto"
    ),
):
    """Checkpointed streaming writer around ``refresh_batch_fn`` — the
    incremental form of the reference's diff→delete→insert refresh."""
    run_batch = refresh_batch_fn(
        transform,
        sink_upsert,
        sink_delete_where,
        key_col,
        sink_delete_where_df=sink_delete_where_df,
    )
    return (
        stream_df.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def windowed_event_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over an event stream - the
    streaming form of the events_hourly_window batch query. Late rows
    beyond the watermark are dropped instead of re-aggregating history."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming arm of the dedup suite: drop rows whose content hash was
    already seen, with state bounded by the event-time watermark
    (``dropDuplicatesWithinWatermark``). The 32-byte hash - not the document
    body - is the dedup state key, so state size is rows-within-horizon x
    32 bytes regardless of document size; the watermark expires state
    instead of letting it grow for the stream's lifetime (what a naive
    ``dropDuplicates`` on an unbounded stream would do)."""
    hashed = stream_df.withColumn("__h", F.md5(F.col(text_col)))
    return (
        hashed.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__h"])
        .drop("__h")
    )


def near_dup_batch_fn(
    index_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> Callable[[DataFrame, int], None]:
    """Build the per-micro-batch admission function used by
    ``foreach_batch_near_dup_filter``. Exposed separately so replay/chaos
    tests can invoke a batch directly (same ``batch_id`` twice) without a
    streaming query wrapping it.

    Per micro-batch (the batch form of the batch-side
    ``dedup.minhash_lsh_pairs``, sharing its build products):

    1. shingle + band the batch (``banded_signature_table``);
    2. candidate-join the batch's ``(band, band_hash)`` rows against the
       PERSISTED index — an equi-join against a parquet table that a real
       deployment partitions by band_hash prefix, so each batch probes a
       sliver of the index, never rescans the admitted corpus;
    3. exact-Jaccard-verify candidates against the stored shingle sets;
       batch docs with a verified match are dropped;
    4. within-batch near-dups collapse to their smallest id (same banded
       self-join, batch-sized);
    5. survivors' rows, shingles, and bands are APPENDED to the store —
       the index is the single source of truth, exactly like the
       incremental BM25 postings (search.py::derive_bm25_tables).

    State is the index on storage, not executor memory — unlike
    ``dropDuplicatesWithinWatermark`` (exact hashes, bounded horizon) this
    catches NEAR duplicates with no time horizon. Deterministic: admission
    depends only on previously-admitted content, and batch-internal ties
    resolve to the smallest id."""
    from vectordb_data_ingestion_spark.operators.dedup import (
        banded_signature_table,
        jaccard_of,
    )

    bands_path = f"{index_dir}/bands"
    shingle_path = f"{index_dir}/shingles"

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        sh_tbl, banded = banded_signature_table(
            batch_df, text_col, id_col, num_hashes, bands, shingle_n
        )
        try:
            # foreachBatch is at-least-once: on replay the index root
            # already holds THIS batch's own batch=N rows (written before
            # the offset commit crashed), and reading them back would make
            # every previously-kept doc self-match at jaccard 1.0 and be
            # wiped by the overwrite below. Exclude the current batch
            # partition from both index reads.
            idx_bands = spark.read.parquet(bands_path).filter(
                F.col("batch") != F.lit(int(batch_id))
            )
            idx_sh = spark.read.parquet(shingle_path).filter(
                F.col("batch") != F.lit(int(batch_id))
            )
        except AnalysisException as e:
            # ONLY the first-batch missing-path case may mean "no index
            # yet" — a corrupt/unreadable index must fail the batch, not
            # silently admit everything unchecked
            if "PATH_NOT_FOUND" not in str(e):
                raise
            idx_bands = None
            idx_sh = None

        dup_ids = None
        if idx_bands is not None:
            cand = (
                banded.select(F.col(id_col).alias("id_new"), "band", "band_hash")
                .join(
                    idx_bands.select(
                        F.col(id_col).alias("id_old"), "band", "band_hash"
                    ),
                    ["band", "band_hash"],
                )
                .select("id_new", "id_old")
                .dropDuplicates()
            )
            verified = (
                cand.join(
                    sh_tbl.select(F.col(id_col).alias("id_new"), F.col("__sh").alias("sh_new")),
                    "id_new",
                )
                .join(
                    idx_sh.select(F.col(id_col).alias("id_old"), F.col("__sh").alias("sh_old")),
                    "id_old",
                )
                .filter(jaccard_of("sh_new", "sh_old") >= jaccard_threshold)
            )
            dup_ids = verified.select(F.col("id_new").alias(id_col)).distinct()

        survivors = batch_df
        if dup_ids is not None:
            survivors = survivors.join(dup_ids, id_col, "left_anti")

        # within-batch collapse: near-dup pairs keep the smaller id
        surv_sh = sh_tbl.join(survivors.select(id_col), id_col)
        l = surv_sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
        r = surv_sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
        bl = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
        br = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
        intra = (
            bl.join(br, ["band", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates()
            .join(l, "id_a")
            .join(r, "id_b")
            .filter(jaccard_of("sh_a", "sh_b") >= jaccard_threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        survivors = survivors.join(intra, id_col, "left_anti").localCheckpoint()

        # batch-keyed subdirs + overwrite, not root-level append: a
        # RETRIED micro-batch (foreachBatch is at-least-once) rewrites its
        # own partition instead of double-appending survivors/index rows
        kept = survivors.select(id_col)
        sub = f"batch={int(batch_id)}"
        survivors.write.mode("overwrite").parquet(f"{out_dir}/{sub}")
        sh_tbl.join(kept, id_col).write.mode("overwrite").parquet(
            f"{shingle_path}/{sub}"
        )
        banded.join(kept, id_col).write.mode("overwrite").parquet(
            f"{bands_path}/{sub}"
        )

    return run_batch


def compact_near_dup_index(spark: SparkSession, index_dir: str) -> int:
    """Merge every ``batch=*`` partition of the persisted near-dup index
    into ONE compacted partition per table (bands/, shingles/).

    Why this exists: ``near_dup_batch_fn`` appends a ``batch=N`` subdir
    per micro-batch, so after K batches every admission probe lists and
    opens O(K) directories — the per-batch cost grows with BATCH COUNT
    even when data volume is flat (measured: tools/probe_streaming_state.py;
    the same failure mode plans/layout.py::compaction_plan targets for
    event tables). A deployment runs this periodically (e.g. every 1000
    batches) from the maintenance cadence, not inside the hot loop.

    Correctness under the admission contract:

    - compacted partitions get NEGATIVE batch ids (one below the lowest
      existing), so ``run_batch``'s replay-exclusion filter
      (``batch != current_batch_id``, always >= 0) never excludes them;
    - the HIGHEST non-negative batch id is never compacted: foreachBatch
      is at-least-once, so the newest ``batch=N`` rows may belong to a
      batch whose offset commit hasn't landed yet. Folding them into a
      negative partition would defeat the replay's ``batch != N``
      self-exclusion — every doc batch N kept would self-match at
      jaccard 1.0 on restart and the replay would overwrite
      ``out_dir/batch=N`` with nothing (data loss). Leaving the newest
      partition out keeps a pending replay's own rows excludable;
    - crash-safe WITHOUT renames (r7): the merged rows are written
      directly to the fresh ``batch=<gen>`` partition and source
      partitions are deleted only after — under the two-marker recovery
      protocol (:func:`_fold_recover`), so a crash at any point either
      rolls the partial generation back or finishes the deletes. (For
      THIS index even unrecovered duplicates would stay verdict-correct —
      ``dup_ids`` is distinct and a duplicate candidate verifies the same
      way — but the shared fold is duplicate-free at rest because the
      ivfpq codes table, which reuses it, is not duplicate-tolerant.)
      Rename-free, so the same sequence is valid on an object store.

    Returns the number of source partitions merged away (0 = nothing to
    do)."""
    import os
    import shutil

    merged = 0
    for sub in ("bands", "shingles"):
        merged += _fold_batch_partitions(spark, f"{index_dir}/{sub}")
    return merged


# how long a loader will wait out a lock-holding RECOVERY (fast rmtree
# work) before concluding the hint is stale and skipping; live folds are
# never waited on this long (no hint -> one 50 ms confirmation poll)
_RECOVERY_WAIT_SECS = 10.0


def _fold_lock(local: str, blocking: bool = True):
    """Exclusive flock on ``<root>/_FOLD_LOCK``, serializing a live fold
    against load-time recovery (the destructive race: a loader that sees
    only ``_FOLD_PENDING`` between the fold's finished target write and
    its ``_FOLD_COMMITTED`` write would rmtree the finished target, then
    the fold would commit and delete every source — rows permanently
    lost). Context manager yielding True when acquired; with
    ``blocking=False`` a held lock yields False instead of waiting (the
    recovery path: a live fold owns the markers — skip, don't repair)."""
    import contextlib
    import fcntl
    import os

    @contextlib.contextmanager
    def _cm():
        fd = os.open(
            os.path.join(local, "_FOLD_LOCK"), os.O_CREAT | os.O_RDWR, 0o644
        )
        try:
            flags = fcntl.LOCK_EX | (0 if blocking else fcntl.LOCK_NB)
            try:
                fcntl.flock(fd, flags)
            except OSError:
                yield False
                return
            yield True
        finally:
            os.close(fd)  # closing releases the flock

    return _cm()


def _fold_recover(root: str, _locked: bool = False) -> None:
    """Finish or roll back a fold interrupted by a crash. Two marker
    files narrate the fold's phase (both under ``root``, underscore
    prefixed so partition discovery ignores them):

    - ``_FOLD_COMMITTED`` present (readable JSON): the merged generation
      is complete — finish by deleting any listed source dirs that still
      exist, then both markers. COMMITTED is checked FIRST and removed
      LAST, so the rollback branch below can never fire after sources
      were deleted.
    - only ``_FOLD_PENDING`` present: the crash hit during (or before)
      the generation write — roll back by removing the partial target;
      the source dirs are intact, nothing was lost. An unreadable/torn
      marker of either kind lands in this branch too (a torn COMMITTED
      means the data write finished but we can't prove it — rolling back
      wastes work, never rows).

    A marker left by a LIVE fold (not a crashed one) must never be
    "recovered": unless the caller already holds the fold lock
    (``_locked=True`` — the fold's own pre-flight recovery), this takes
    it non-blocking; when it's held, the holder is either a live fold
    (markers span its whole generation write — skip, it finishes its own
    protocol) or ANOTHER LOADER'S RECOVERY, which is fast but destructive
    mid-flight: skipping past it and reading could observe a
    partially-rmtree'd target next to intact sources (ADVICE r8).
    Recovery holders therefore advertise themselves with a
    ``_FOLD_RECOVERING`` hint (written under the lock before any
    destructive step, removed after the markers), and the skip path
    WAITS a recovery holder out for as long as the flock stays held:
    the flock itself is the liveness signal — a crashed holder's lock is
    released by the kernel and the very next 50 ms poll acquires it and
    re-runs recovery, so the hint+held-lock state can only mean a
    recoverer that is provably ALIVE mid-destructive-work, exactly the
    window a wall-clock bail-out would skip into (VERDICT r9: the old
    ``_RECOVERY_WAIT_SECS`` deadline fired precisely when recovery was
    slow — a multi-GB partial generation on network storage — and
    reopened the race on its worst case). ``_RECOVERY_WAIT_SECS`` now
    only times a one-shot RuntimeWarning so an operator can see the
    stall. The deliberate tradeoff: a holder that is alive but HUNG
    (not crashed) parks loaders indefinitely, the same semantics as any
    held lock — killing the hung process frees the flock and the loop
    self-heals on its next poll. A no-hint holder gets one confirmation
    poll (covering the instant between a recoverer's flock and its hint
    write) before being judged a live fold and skipped. Lock-free fast
    path when no marker exists (the common case; also keeps read-only
    stores readable)."""
    import json as _json
    import os
    import shutil
    import time

    local = root[len("file:"):] if root.startswith("file:") else root
    pending = os.path.join(local, "_FOLD_PENDING")
    committed = os.path.join(local, "_FOLD_COMMITTED")
    recovering = os.path.join(local, "_FOLD_RECOVERING")
    if not (os.path.exists(pending) or os.path.exists(committed)):
        # a crash between marker removal and hint removal strands the
        # hint; with no markers there is no recovery to wait for, so
        # clear it (best-effort: read-only stores stay readable)
        if os.path.exists(recovering):
            try:
                os.remove(recovering)
            except OSError:
                pass
        return
    if not _locked:
        warn_at = time.monotonic() + _RECOVERY_WAIT_SECS
        saw_no_hint = False
        warned = False
        while True:
            with _fold_lock(local, blocking=False) as got:
                if got:
                    _fold_recover(root, _locked=True)
                    return
            if not (
                os.path.exists(pending) or os.path.exists(committed)
            ):
                return  # the holder finished its protocol
            if not os.path.exists(recovering):
                if saw_no_hint:
                    return  # live fold owns the markers — skip
                saw_no_hint = True
            else:
                # hint + continuously-held flock = provably-alive
                # recoverer mid-destructive-work: keep waiting (a crashed
                # holder's flock frees and the next poll repairs; never
                # skip into the mid-rmtree window — VERDICT r9)
                saw_no_hint = False
                if not warned and time.monotonic() >= warn_at:
                    import warnings

                    warnings.warn(
                        f"fold recovery on {local} has held its lock for "
                        f"over {_RECOVERY_WAIT_SECS:.0f}s; waiting it out "
                        "(a crashed holder frees the lock automatically — "
                        "if the holder is hung, killing it unblocks this "
                        "loader)",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    warned = True
            time.sleep(0.05)

    def read_marker(path):
        try:
            with open(path) as fh:
                return _json.load(fh)
        except (FileNotFoundError, ValueError):
            return None

    with open(recovering, "w") as fh:
        fh.write("recovery in progress\n")
    try:
        state = read_marker(committed)
        if state is not None:
            for d in state.get("sources", []):
                shutil.rmtree(os.path.join(local, d), ignore_errors=True)
            for m in (pending, committed):  # pending first, committed last
                try:
                    os.remove(m)
                except FileNotFoundError:
                    pass
            return
        state = read_marker(pending)
        if state is not None:
            shutil.rmtree(
                os.path.join(local, state["target"]), ignore_errors=True
            )
        for m in (pending, committed):
            try:
                os.remove(m)
            except FileNotFoundError:
                pass
    finally:
        try:
            os.remove(recovering)
        except FileNotFoundError:
            pass


def _fold_batch_partitions(
    spark: SparkSession, root: str, partition_by: tuple[str, ...] = ()
) -> int:
    """Shared fold for batch-keyed index tables (near-dup bands/shingles,
    ivfpq codes): merge every foldable ``batch=*`` partition into one
    fresh negative-id generation, never touching the newest non-negative
    batch (its offset commit may be pending — see
    ``compact_near_dup_index``'s docstring for the replay proof).
    Non-numeric batch ids (the ivfpq base build's ``batch=base``) fold
    like old batches: they are written synchronously, never replayed.
    ``partition_by`` preserves inner partitioning (ivfpq's ``cell`` —
    probe pruning depends on it).

    Rename-free AND duplicate-free at rest: the two-marker protocol
    (:func:`_fold_recover`) means a crash at any point either rolls the
    partial generation back (sources intact) or finishes the source
    deletes — an index LOADED after a crash never serves the same row
    twice. (A reader concurrent with the fold itself can see duplicates
    between the commit marker and the source deletes — compaction is a
    maintenance-window operation, same contract as every vacuum here.)

    The whole fold runs under :func:`_fold_lock`, so a concurrent
    loader's recovery pass can never roll back a generation this fold is
    about to commit (ADVICE r7: the lost-rows load-during-fold race)."""
    import os

    local = root[len("file:"):] if root.startswith("file:") else root
    if not os.path.isdir(local):
        return 0
    with _fold_lock(local):
        return _fold_batch_partitions_locked(spark, root, local, partition_by)


def _fold_batch_partitions_locked(
    spark: SparkSession,
    root: str,
    local: str,
    partition_by: tuple[str, ...],
) -> int:
    """Body of :func:`_fold_batch_partitions`; caller holds the fold lock
    for the whole fold, so a concurrent :func:`_fold_recover` (e.g. from
    ``load_ivfpq_index``) can never mistake our in-progress markers for a
    crash and roll back a generation we are about to commit."""
    import json as _json
    import os
    import shutil

    _fold_recover(root, _locked=True)

    def batch_id(d: str):
        raw = d.split("=", 1)[1]
        try:
            return int(raw)
        except ValueError:
            return None  # e.g. batch=base — foldable, never newest

    parts = [
        d
        for d in os.listdir(local)
        if d.startswith("batch=") and os.path.isdir(os.path.join(local, d))
    ]
    non_negative = [b for b in map(batch_id, parts) if b is not None and b >= 0]
    if non_negative:
        newest = max(non_negative)
        parts = [d for d in parts if batch_id(d) != newest]
    if len(parts) <= 1:
        return 0
    numeric = [b for b in map(batch_id, parts) if b is not None]
    gen = min([*numeric, 0]) - 1
    target_name = f"batch={gen}"
    pending = os.path.join(local, "_FOLD_PENDING")
    committed = os.path.join(local, "_FOLD_COMMITTED")
    payload = _json.dumps({"target": target_name, "sources": parts})
    with open(pending, "w") as fh:
        fh.write(payload)
        fh.flush()
        os.fsync(fh.fileno())

    srcs = [f"{root}/{d}" for d in parts]
    # basePath so multi-level sources (codes' batch=/cell=) read as one
    # table instead of "conflicting directory structures"; the inferred
    # `batch` column is the partition key being folded away — drop it so
    # rows land under the new batch=<gen> dir name alone
    df = spark.read.option("basePath", root).parquet(*srcs)
    if "batch" in df.columns:
        df = df.drop("batch")
    writer = df.coalesce(
        max(1, spark.sparkContext.defaultParallelism // 4)
    ).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(local, target_name))

    # belt-and-braces under the flock (and the only guard a lock-less
    # substrate would have): never commit a target something deleted out
    # from under us — COMMITTED followed by source deletes would then be
    # permanent row loss. Sources are intact here, so aborting loses work,
    # never data.
    if not os.path.isdir(os.path.join(local, target_name)):
        os.remove(pending)
        raise RuntimeError(
            f"fold target {target_name} under {root} vanished before "
            "commit — aborting the fold (source partitions are intact)"
        )
    with open(committed, "w") as fh:
        fh.write(payload)
        fh.flush()
        os.fsync(fh.fileno())
    merged = 0
    for d in parts:
        shutil.rmtree(os.path.join(local, d))
        merged += 1
    os.remove(pending)
    os.remove(committed)
    return merged


def compact_ivfpq_codes(spark: SparkSession, index_dir: str) -> int:
    """Fold the ivfpq ``codes/`` table's per-batch partitions (the base
    build's ``batch=base`` plus streaming appends' ``batch=<id>`` dirs,
    ``foreach_batch_index_append``) into one compacted generation,
    PRESERVING the ``cell`` partitioning the probe pruning reads. Same
    contract as :func:`compact_near_dup_index`: newest non-negative batch
    never folds (pending-replay safety — a replayed append overwrites its
    own ``batch=N`` dir, which must still exist as the only copy of those
    rows), rename-free, crash points leave duplicates that the next
    compaction folds. Run from the maintenance cadence."""
    import os

    return _fold_batch_partitions(
        spark, os.path.join(index_dir, "codes"), partition_by=("cell",)
    )


def foreach_batch_near_dup_filter(
    stream_df: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
):
    """Wire ``near_dup_batch_fn`` (see its docstring for the admission
    contract) into a checkpointed ``foreachBatch`` streaming writer."""
    run_batch = near_dup_batch_fn(
        index_dir,
        out_dir,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
    )
    return (
        stream_df.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
