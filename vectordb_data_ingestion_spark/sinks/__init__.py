"""Vector-store sinks.

Two substrates carry the same mutation contract (``upsert`` / ``read`` /
``delete_where`` / ``delete_where_df``, plus each substrate's own
maintenance surface — the manifest sink adds ``maybe_compact`` /
``vacuum`` / ``read_at`` since its segments accrete, while the POSIX
sink's rewrites are self-compacting):

- ``ParquetVectorSink`` (vector_store.py) — POSIX substrate: rename +
  flock protocols, the hermetic/local deployment;
- ``ManifestVectorSink`` (manifest_sink.py) — object-store substrate:
  immutable segments + one conditional-put manifest, the 100 TB cluster
  deployment.

Pipelines take the sink as a constructor choice: build either here (or
pass any object with the same methods) and hand its bound methods to
``foreach_batch_refresh`` / ``refresh_batch_fn``, which are
sink-agnostic by design.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession


def make_vector_sink(
    spark: SparkSession, kind: str, base_path: str, **kw: Any
):
    """Construct a vector sink by substrate name: ``"posix"``
    (``ParquetVectorSink``) or ``"manifest"`` (``ManifestVectorSink``).
    The end-to-end sink choice for composed pipelines — both carry the
    identical contract, so refresh/replay flows run unchanged on
    either."""
    if kind == "posix":
        from vectordb_data_ingestion_spark.sinks.vector_store import (
            ParquetVectorSink,
        )

        return ParquetVectorSink(spark, base_path, **kw)
    if kind == "manifest":
        from vectordb_data_ingestion_spark.sinks.manifest_sink import (
            ManifestVectorSink,
        )

        return ManifestVectorSink(spark, base_path, **kw)
    if kind == "manifest-log":
        import os

        from vectordb_data_ingestion_spark.sinks.commit_store import (
            FileConditionalStore,
        )
        from vectordb_data_ingestion_spark.sinks.log_store import (
            LogConditionalStore,
        )
        from vectordb_data_ingestion_spark.sinks.manifest_sink import (
            ManifestVectorSink,
        )

        # same sink, chunked commit log: commit bytes stay O(mutation)
        # instead of O(sink metadata) — the high-commit-rate deployment
        ckpt = kw.pop("checkpoint_every", 32)
        store = kw.pop("store", None) or LogConditionalStore(
            FileConditionalStore(
                os.path.join(base_path.rstrip("/"), "_ctrl")
            ),
            checkpoint_every=ckpt,
        )
        return ManifestVectorSink(spark, base_path, store=store, **kw)
    raise ValueError(
        f"unknown sink kind {kind!r}: use 'posix', 'manifest' or "
        "'manifest-log'"
    )
