"""Object-store-safe parquet vector sink (manifest-log commit protocol).

``ParquetVectorSink`` (vector_store.py) is correct on POSIX: its crash
safety is built from directory renames and its concurrency from an flock
sidecar. The stated deployment target — 100 TB on a 1000-executor cluster —
stores data in an object store with NO rename and NO flock, so that
protocol cannot run there (VERDICT r6 item 2). This module is the same
sink contract (``upsert`` / ``read`` / ``delete_where`` /
``delete_where_df`` / bucketed layout, the reference's Weaviate surface:
idempotent batch load cmfunctions.py:177-223 + predicate delete
cmfunctions.py:226-261) re-expressed over the two primitives an object
store actually provides:

- **immutable data objects**: every write lands in a fresh uniquely-named
  segment directory under ``<base>/_data/``; nothing is ever renamed or
  rewritten in place;
- **conditional put** of ONE small control object (the manifest) through
  :class:`~.commit_store.ConditionalStore`: visibility = the file list the
  manifest names, committed by compare-and-swap (the Delta/Iceberg commit
  pattern from the public literature).

Correctness properties, each pinned by tests/test_manifest_sink.py:

- **crash safety for free**: a mutation that dies before its CAS leaves an
  orphan segment no manifest references — invisible to every reader; no
  recovery dance, ``vacuum()`` reclaims the bytes later;
- **no lost updates without locks**: concurrent mutators race on the CAS;
  the loser re-reads the new manifest and re-derives its mutation
  (``delete`` re-scans, ``upsert`` re-appends), so delete-vs-append on one
  sink never drops either side's rows;
- **bucket-pruned deletes survive the translation**: a key-predicate
  delete still rewrites only the ``pbucket=`` files its keys hash into —
  untouched buckets' files carry over into the new manifest by REFERENCE,
  zero bytes copied;
- **replay idempotence** (the refresh contract): delete-then-insert with
  the same batch re-applied converges to the same visible rows.
"""

from __future__ import annotations

import json
import os
import uuid
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.sinks.commit_store import (
    ConditionalStore,
    FileConditionalStore,
)

_MANIFEST_KEY = "MANIFEST"


class ManifestVectorSink:
    """Vector-store sink whose only mutable state is one conditional-put
    control object. See module docstring for the protocol; layout:

    - ``n_buckets > 0`` + ``key_col``: rows land under
      ``pbucket=pmod(xxhash64(key), n_buckets)`` inside each segment, and
      key deletes prune to touched buckets (same layout contract as
      ``ParquetVectorSink``, same xxhash64 type-cast rule);
    - the manifest records the layout config; reopening with a different
      one fails loudly (the mixed-layout hazard, caught at open not at
      first delete).
    """

    BUCKET_COL = "pbucket"

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        partition_col: str | None = "load_dt",
        key_col: str | None = None,
        n_buckets: int = 0,
        store: ConditionalStore | None = None,
        max_cas_retries: int = 50,
    ):
        if n_buckets and not key_col:
            raise ValueError("n_buckets requires key_col (the bucket key)")
        self.spark = spark
        self.base_path = base_path.rstrip("/")
        self.partition_col = partition_col
        self.key_col = key_col
        self.n_buckets = int(n_buckets)
        self.max_cas_retries = max_cas_retries
        # default binding: the file-backed conditional-put fake under the
        # sink root (control objects under _ctrl/ — underscore-prefixed,
        # invisible to parquet discovery); a real deployment passes the
        # store wrapping its conditional-put API
        self.store = store or FileConditionalStore(
            os.path.join(self.base_path, "_ctrl")
        )
        self._validate_layout()

    # -- manifest plumbing -------------------------------------------------

    def _get_manifest(self) -> tuple[dict | None, object]:
        cur = self.store.get(_MANIFEST_KEY)
        if cur is None:
            return None, None
        return json.loads(cur[0].decode("utf-8")), cur[1]

    def _layout(self) -> dict:
        return {
            "partition_col": self.partition_col,
            "key_col": self.key_col,
            "n_buckets": self.n_buckets,
        }

    def _validate_layout(self) -> None:
        manifest, _ = self._get_manifest()
        if manifest is None:
            return
        stored = manifest.get("layout", {})
        if stored != self._layout():
            raise RuntimeError(
                f"sink at {self.base_path} was built with layout {stored}; "
                f"reopening with {self._layout()} would corrupt pruning — "
                "open it with the layout it was built with"
            )

    def _bucket_expr(self, col):
        return F.pmod(F.xxhash64(F.col(col)), F.lit(self.n_buckets)).cast(
            "int"
        )

    def _partition_cols(self, df: DataFrame) -> list[str]:
        cols = []
        if self.n_buckets and self.BUCKET_COL in df.columns:
            cols.append(self.BUCKET_COL)
        if self.partition_col and self.partition_col in df.columns:
            cols.append(self.partition_col)
        return cols

    def _write_segment(self, df: DataFrame) -> dict:
        """Write one immutable segment dir and return its manifest entry
        (not yet visible — the caller commits it via CAS)."""
        seg = uuid.uuid4().hex
        seg_dir = os.path.join(self.base_path, "_data", seg)
        writer = df.write.mode("overwrite")
        parts = self._partition_cols(df)
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(seg_dir)
        files = []
        for dirpath, _dirs, names in os.walk(seg_dir):
            rel = os.path.relpath(dirpath, seg_dir)
            for n in names:
                if n.endswith(".parquet"):
                    files.append(n if rel == "." else os.path.join(rel, n))
        return {"dir": seg, "files": sorted(files)}

    def _drop_segment(self, entry: dict) -> None:
        import shutil

        shutil.rmtree(
            os.path.join(self.base_path, "_data", entry["dir"]),
            ignore_errors=True,
        )

    def _read_entries(self, segments: list[dict]) -> DataFrame:
        dfs = []
        for seg in segments:
            if not seg["files"]:
                continue
            seg_dir = os.path.join(self.base_path, "_data", seg["dir"])
            paths = [os.path.join(seg_dir, f) for f in seg["files"]]
            # basePath per segment: partition columns (pbucket/load_dt)
            # are inferred from the file paths even for an explicit list
            dfs.append(
                self.spark.read.option("basePath", seg_dir).parquet(*paths)
            )
        if not dfs:
            raise FileNotFoundError(
                f"sink at {self.base_path} is empty or does not exist"
            )
        return reduce(lambda a, b: a.unionByName(b), dfs)

    # -- contract ----------------------------------------------------------

    def upsert(self, df: DataFrame) -> None:
        if self.n_buckets:
            # recompute, never trust a caller-supplied bucket column
            df = df.withColumn(self.BUCKET_COL, self._bucket_expr(self.key_col))
        entry = self._write_segment(df)

        for attempt in range(self.max_cas_retries + 1):
            manifest, token = self._get_manifest()
            new = manifest or {"layout": self._layout(), "segments": []}
            if new.get("layout", self._layout()) != self._layout():
                self._drop_segment(entry)
                raise RuntimeError(
                    f"sink at {self.base_path} layout changed concurrently"
                )
            new = {
                "layout": new["layout"],
                "segments": [*new["segments"], entry],
            }
            if self.store.put_if(
                _MANIFEST_KEY, json.dumps(new).encode(), token
            ):
                return
        self._drop_segment(entry)
        raise RuntimeError(
            f"upsert on {self.base_path} lost {self.max_cas_retries} CAS races"
        )

    def _read_raw(self) -> DataFrame:
        manifest, _ = self._get_manifest()
        if manifest is None:
            raise FileNotFoundError(
                f"sink at {self.base_path} is empty or does not exist"
            )
        return self._read_entries(manifest["segments"])

    def read(self) -> DataFrame:
        df = self._read_raw()
        return df.drop(self.BUCKET_COL) if self.n_buckets else df

    def delete_where(self, col: str, values: list[Any]) -> None:
        if not values:
            return
        self.delete_where_df(
            col, self.spark.createDataFrame([(v,) for v in values], [col])
        )

    def delete_where_df(self, col: str, keys: DataFrame) -> None:
        """Anti-join delete as a CAS loop: derive survivors against the
        manifest generation we read; if another mutation commits first,
        our CAS fails, the staged segment is dropped (it was derived from
        a stale generation) and the whole delete re-derives — no lost
        update, no lock."""
        key_df = keys.select(F.col(keys.columns[0]).alias(col)).distinct()

        for attempt in range(self.max_cas_retries + 1):
            manifest, token = self._get_manifest()
            if manifest is None or not any(
                s["files"] for s in manifest["segments"]
            ):
                return  # nothing visible to delete (first-batch no-op)
            current = self._read_entries(manifest["segments"])
            # xxhash64 / join-key type rule (shared with ParquetVectorSink):
            # cast the key set to the STORED column type before hashing
            typed = key_df.select(
                F.col(col).cast(current.schema[col].dataType).alias(col)
            )

            if self.n_buckets and col == self.key_col:
                affected = sorted(
                    r[0]
                    for r in typed.select(
                        self._bucket_expr(col).alias("b")
                    ).distinct().collect()
                    if r[0] is not None
                )
                if not affected:
                    return

                def in_affected(path: str) -> bool:
                    return any(
                        f"{self.BUCKET_COL}={b}{os.sep}" in path
                        or path.startswith(f"{self.BUCKET_COL}={b}/")
                        for b in affected
                    )

                touched_segments = []
                kept_segments = []
                for seg in manifest["segments"]:
                    touched = [f for f in seg["files"] if in_affected(f)]
                    kept = [f for f in seg["files"] if not in_affected(f)]
                    if touched:
                        touched_segments.append(
                            {"dir": seg["dir"], "files": touched}
                        )
                    # untouched files carry over BY REFERENCE — zero bytes
                    # copied for unaffected buckets
                    kept_segments.append({"dir": seg["dir"], "files": kept})
                if not touched_segments:
                    return
                scan = self._read_entries(touched_segments)
            else:
                kept_segments = []
                scan = current

            remaining = scan.join(typed, col, "left_anti").select(
                *scan.columns
            )
            entry = self._write_segment(remaining)
            new_segments = [
                *(s for s in kept_segments if s["files"]),
                entry,
            ]
            new = {"layout": manifest["layout"], "segments": new_segments}
            if self.store.put_if(
                _MANIFEST_KEY, json.dumps(new).encode(), token
            ):
                return
            self._drop_segment(entry)  # stale derivation — retry
        raise RuntimeError(
            f"delete on {self.base_path} lost {self.max_cas_retries} CAS races"
        )

    def compact(self) -> int:
        """Fold every visible segment into one (object-store compaction:
        read visible rows, write a single fresh segment, CAS-swap). Returns
        the number of segments merged away; concurrent mutations win the
        race and the compaction simply retries."""
        for attempt in range(self.max_cas_retries + 1):
            manifest, token = self._get_manifest()
            if manifest is None or len(manifest["segments"]) <= 1:
                return 0
            n = len(manifest["segments"])
            entry = self._write_segment(self._read_entries(manifest["segments"]))
            new = {"layout": manifest["layout"], "segments": [entry]}
            if self.store.put_if(
                _MANIFEST_KEY, json.dumps(new).encode(), token
            ):
                return n
            self._drop_segment(entry)
        raise RuntimeError(
            f"compact on {self.base_path} lost {self.max_cas_retries} CAS races"
        )

    def vacuum(self) -> int:
        """Remove data segment dirs the manifest no longer references —
        the leftovers of mutations that crashed before their CAS (or lost
        it). Quiescent-only, like the datasource writer's vacuum: an
        in-flight mutation's staged segment is indistinguishable from an
        orphan. Returns dirs removed."""
        import shutil

        data_root = os.path.join(self.base_path, "_data")
        if not os.path.isdir(data_root):
            return 0
        manifest, _ = self._get_manifest()
        live = {
            s["dir"] for s in (manifest or {}).get("segments", [])
        }
        removed = 0
        for d in os.listdir(data_root):
            if d not in live:
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                removed += 1
        return removed
