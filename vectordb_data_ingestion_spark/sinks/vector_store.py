"""Vector-store sinks.

Two implementations of the same contract (``ensure_class`` /
``upsert`` / ``delete_where``), mirroring the reference's Weaviate surface:

- :class:`ParquetVectorSink` - the hermetic/local substrate: the chunk
  table as parquet, partitioned by a load-date column so incremental
  refresh prunes partitions. ``delete_where`` rewrites only affected data
  via an anti-join (delete-then-insert consistency for incremental refresh,
  pairing with delete_filedata_from_vectordb, cmfunctions.py:226-261).

- :class:`BatchingClientSink` - the external-store path
  (data_load_weaviate, cmfunctions.py:177-223): ``foreachPartition``
  writer, one client per partition, batched adds with exponential-backoff
  retry (cmfunctions.py:103, 489-492), idempotent upserts keyed by the
  deterministic ``chunk_id`` (the reference's uuid4 at
  sharepointutils.py:381 breaks retry idempotence; deterministic ids fix
  it). The client is injected via a factory so tests run against an
  in-memory/file-backed fake and production swaps in a real
  ``weaviate.Client`` without code changes.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VectorClient(Protocol):
    """Minimal client surface (subset of the weaviate v1 client used by the
    reference)."""

    def ensure_class(self, class_name: str, properties: list[dict]) -> None: ...

    def add_batch(self, class_name: str, objects: list[dict]) -> None: ...

    def delete_where(self, class_name: str, path: str, values: list[Any]) -> None: ...


# ---------------------------------------------------------------------------
# Parquet substrate
# ---------------------------------------------------------------------------


class ParquetVectorSink:
    def __init__(self, spark: SparkSession, base_path: str, partition_col: str | None = "load_dt"):
        self.spark = spark
        self.base_path = base_path
        self.partition_col = partition_col
        self._recover()

    def _recover(self) -> None:
        """Finish or roll back a rewrite interrupted by a crash. The swap
        in :meth:`_rewrite` renames completed-new in before deleting old,
        so on entry at most one of these holds:

        - ``base`` missing + ``__rewrite`` present: the crash hit between
          the two renames — the rewrite WAS complete (it only renames
          after the write succeeds), finish it.
        - ``base`` present + ``__rewrite`` present: a crash mid-write
          left a partial rewrite — discard it.
        - ``base`` present + ``__old`` present: the crash hit before the
          old copy was deleted — the swap finished, retire the old copy.
        """
        import os
        import shutil

        base = self.base_path.rstrip("/")
        tmp, old = base + "__rewrite", base + "__old"
        if not os.path.exists(base) and os.path.exists(tmp):
            os.rename(tmp, base)
        elif os.path.exists(base) and os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(base) and os.path.exists(old):
            shutil.rmtree(old)

    def upsert(self, df: DataFrame) -> None:
        self._recover()
        writer = df.write.mode("append")
        if self.partition_col and self.partition_col in df.columns:
            writer = writer.partitionBy(self.partition_col)
        writer.parquet(self.base_path)

    def read(self) -> DataFrame:
        self._recover()
        return self.spark.read.parquet(self.base_path)

    def delete_where(self, col: str, values: list[Any]) -> None:
        """Predicate delete via rewrite: read, anti-filter, overwrite.
        With a partitioned layout and a partition-aligned predicate this
        touches only affected partitions (dynamic partition overwrite);
        table formats with real deletes (Delta/Iceberg) would do this
        transactionally. No-op on a sink that doesn't exist yet (first
        incremental batch). ``values`` is a driver-side list (fine to
        ~1M keys via InSet); when the keys already live in a DataFrame,
        use :meth:`delete_where_df` and skip the driver round trip."""
        import os

        self._recover()
        if not os.path.exists(self.base_path):
            return
        current = self.read()
        # keep NULL-keyed rows: ~isin() is NULL (dropped by filter) for
        # NULL keys, which would silently delete every NULL-keyed row —
        # the anti-join form (delete_where_df) retains them, and the two
        # paths must agree on which rows survive
        self._rewrite(
            current.filter(~F.col(col).isin(values) | F.col(col).isNull())
        )

    def delete_where_df(self, col: str, keys: DataFrame) -> None:
        """Anti-join form of :meth:`delete_where`: the key set stays
        distributed, so a micro-batch with millions of changed documents
        never materializes its keys on the driver. The join strategy is
        left to AQE (r5): catalog-sized key sets broadcast into the scan;
        a backfill batch whose keys outgrow executor memory falls back to
        a shuffled anti-join instead of OOMing on a forced broadcast."""
        import os

        self._recover()
        if not os.path.exists(self.base_path):
            return
        key_df = keys.select(F.col(keys.columns[0]).alias(col)).distinct()
        current = self.read()
        # USING-style join moves the key column to the front — restore the
        # stored column order, or every rewrite permutes the sink schema
        remaining = current.join(
            key_df, col, "left_anti"
        ).select(*current.columns)
        self._rewrite(remaining)

    def _rewrite(self, remaining: DataFrame) -> None:
        """Crash-safe swap: the old layout stays on disk until the new one
        is fully in place (rmtree-then-move had a crash window as wide as
        the delete itself, after which a replaying micro-batch would
        silently rebuild the sink from only the latest batch). Every crash
        point here is repaired by :meth:`_recover`."""
        import os
        import shutil

        base = self.base_path.rstrip("/")
        tmp, old = base + "__rewrite", base + "__old"
        writer = remaining.write.mode("overwrite")
        if self.partition_col and self.partition_col in remaining.columns:
            writer = writer.partitionBy(self.partition_col)
        writer.parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)  # stale from a prior crash
        os.rename(base, old)
        os.rename(tmp, base)
        shutil.rmtree(old)


# ---------------------------------------------------------------------------
# Batched external-client sink
# ---------------------------------------------------------------------------


def _with_backoff(fn, max_retries: int = 5, base_delay: float = 0.1):
    """Exponential backoff, the reference's retry policy
    (cmfunctions.py:103, 489-492) without the external backoff package."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception:  # noqa: BLE001 - sink boundary
            attempt += 1
            if attempt > max_retries:
                raise
            time.sleep(base_delay * (2 ** (attempt - 1)))


class BatchingClientSink:
    def __init__(
        self,
        client_factory: Callable[[], VectorClient],
        class_name: str,
        batch_size: int = 150,  # the pipeline's BATCH_SIZE (data_ingestion.py:97)
        max_retries: int = 5,
        id_col: str = "chunk_id",
        vector_col: str = "vector",
    ):
        self.client_factory = client_factory
        self.class_name = class_name
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.id_col = id_col
        self.vector_col = vector_col

    def ensure_class(self, properties: list[dict]) -> None:
        client = self.client_factory()
        client.ensure_class(self.class_name, properties)

    def upsert(self, df: DataFrame, property_cols: list[str]) -> None:
        """foreachPartition writer: per-partition client, batched adds,
        backoff retry per batch. Objects carry (id, vector, properties) -
        idempotent because ids are deterministic."""
        class_name = self.class_name
        batch_size = self.batch_size
        max_retries = self.max_retries
        id_col, vector_col = self.id_col, self.vector_col
        factory = self.client_factory

        def write_partition(rows):
            client = factory()
            batch: list[dict] = []

            def flush():
                if batch:
                    payload = list(batch)
                    _with_backoff(
                        lambda: client.add_batch(class_name, payload),
                        max_retries=max_retries,
                    )
                    batch.clear()

            for row in rows:
                batch.append(
                    {
                        "id": row[id_col],
                        "vector": list(row[vector_col]) if row[vector_col] is not None else None,
                        "properties": {c: row[c] for c in property_cols},
                    }
                )
                if len(batch) >= batch_size:
                    flush()
            flush()

        df.select(id_col, vector_col, *property_cols).foreachPartition(
            write_partition
        )

    def delete_where(self, path: str, values: list[Any]) -> None:
        """Predicate delete (delete_filedata_from_vectordb semantics,
        cmfunctions.py:226-261) - driver-side, value list is catalog-sized."""
        client = self.client_factory()
        _with_backoff(
            lambda: client.delete_where(self.class_name, path, values),
            max_retries=self.max_retries,
        )
