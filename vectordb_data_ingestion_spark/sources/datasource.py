"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``) for
document catalogs.

SURVEY.md §2.1 maps the reference's SharePoint walk + serial download
(sharepointutils.py:42-101) to "a custom Python DataSource or driver-side
listing". ``sharepoint.py`` is the driver-side-listing form; this module is
the full DataSource form — the one that composes with ``spark.read`` and
pushes the reference's delta predicate (``modified_dt > load_dt``,
sharepointutils.py:158-161) into the *listing*, so pruned files are never
opened, let alone scanned:

    spark.dataSource.register(DocumentCatalogDataSource)
    df = (spark.read.format("document_catalog")
          .option("path", root)
          .option("modified_after", "2024-01-01T00:00:00")
          .option("files_per_partition", "64")
          .load())

Listing happens once on the driver (metadata-sized); file *content* is
fetched inside ``read(partition)`` on executors, ``files_per_partition``
files per task — the partition-parallel replacement for the serial
download loop. The fetcher here is the local filesystem; a SharePoint
deployment swaps ``_fetch`` for an HTTP GET with the same contract.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

CATALOG_SCHEMA = (
    "name string, url string, modified_dt timestamp, file_type string, "
    "n_bytes long, content binary"
)


def _file_type(name: str) -> str | None:
    # identify_filetype semantics (sharepointutils.py:103-108)
    base, dot, ext = name.rpartition(".")
    return ext.lower() if dot and base and ext.isalnum() else None


class _FilesPartition(InputPartition):
    def __init__(self, files: list[tuple[str, str, float, int]]):
        self.files = files


class DocumentCatalogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("document_catalog requires option 'path'")
        self.modified_after = options.get("modified_after")
        self.files_per_partition = int(options.get("files_per_partition", "64"))

    def _listing(self) -> list[tuple[str, str, float, int]]:
        """Driver-side recursive walk with listing-level pruning: files at
        or before ``modified_after`` are dropped before any partition is
        planned (the reference's incremental predicate, done by the
        connector)."""
        cutoff = None
        if self.modified_after:
            dt = datetime.fromisoformat(self.modified_after)
            if dt.tzinfo is None:
                # tz-naive cutoffs are UTC: the emitted modified_dt is
                # UTC, and an incremental loader feeds max(modified_dt)
                # straight back as modified_after — interpreting it in
                # the driver's LOCAL zone would permanently skip (or
                # re-ingest) every file inside the UTC-offset window
                dt = dt.replace(tzinfo=timezone.utc)
            cutoff = dt.timestamp()
        out = []
        for dirpath, _dirs, names in os.walk(self.root):
            for fn in sorted(names):
                p = os.path.join(dirpath, fn)
                try:
                    st = os.stat(p)
                except (FileNotFoundError, OSError):
                    continue  # broken symlink / vanished mid-walk
                if cutoff is not None and st.st_mtime <= cutoff:
                    continue
                out.append((fn, p, st.st_mtime, st.st_size))
        return out

    def partitions(self):
        files = self._listing()
        n = self.files_per_partition
        chunks = [files[i : i + n] for i in range(0, len(files), n)]
        return [_FilesPartition(c) for c in chunks] or [_FilesPartition([])]

    def read(self, partition: _FilesPartition):
        for name, url, mtime, size in partition.files:
            try:
                with open(url, "rb") as f:
                    content = f.read()
            except OSError:
                # deleted between listing and task execution, or turned
                # unreadable (permissions / stale NFS handle) — one bad
                # file must not kill the task (review r6)
                continue
            yield (
                name,
                url,
                # tz-AWARE: stripping tzinfo made Spark read the UTC
                # wall-clock in the SESSION zone, skewing the stored
                # instant by the UTC offset whenever the session isn't
                # UTC — which poisons every modified_dt > load_dt
                # comparison against correctly-stored timestamps
                # (review r6, confirmed live)
                datetime.fromtimestamp(mtime, tz=timezone.utc),
                _file_type(name),
                size,
                content,
            )


class DocumentCatalogStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the catalog walk: each micro-batch picks up files
    whose mtime advanced past the committed offset — the continuous version
    of the reference's incremental predicate (``modified_dt > load_dt``,
    sharepointutils.py:158-161), with the load_dt bookkeeping replaced by
    Structured Streaming's checkpointed offset log (exactly-once without a
    hand-rolled state table).

    Offset = ``{"mtime_ns": n}``: files with ``st_mtime_ns > n`` belong to
    the next batch. The batch's end offset is ``scan start - grace`` (wall
    clock, default 2 s), NOT the max mtime seen: ending at the max would
    permanently lose any file whose mtime lands at-or-before it after the
    walk already passed its directory (coarse filesystem timestamp
    granularity makes that race common). Files younger than the grace
    window simply wait one batch. ``readBetweenOffsets`` replays a
    committed window ``(start, end]`` after a restart; a file
    *re*-modified after ``end`` is deliberately excluded from the replay
    (it belongs to a later batch), a file modified again *within* the
    window replays with its current content, and a file deleted since the
    batch committed is skipped rather than wedging the restart — the
    standard best-effort contract for a filesystem source without version
    history.

    The simple (driver-side) reader variant fits here because the listing
    is metadata-sized; content bytes still flow through the stream as rows,
    so keep files-per-batch bounded upstream (micro-batch trigger interval)
    or swap in the partitioned ``DataSourceStreamReader`` for wide fan-out.
    """

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("document_catalog requires option 'path'")
        self.grace_ns = int(
            float(options.get("grace_seconds", "2.0")) * 1_000_000_000
        )

    def initialOffset(self) -> dict:
        return {"mtime_ns": -1}

    def _scan(self, after_ns: int, up_to_ns: int):
        for dirpath, _dirs, names in os.walk(self.root):
            for fn in sorted(names):
                p = os.path.join(dirpath, fn)
                try:
                    st = os.stat(p)
                except OSError:
                    # vanished mid-walk OR unreadable (permissions, stale
                    # NFS handle): catching only FileNotFoundError let one
                    # bad file wedge the stream forever — the offset never
                    # advanced past it (review r6)
                    continue
                if st.st_mtime_ns <= after_ns or st.st_mtime_ns > up_to_ns:
                    continue
                yield fn, p, st

    def _rows(self, entries):
        for fn, p, st in entries:
            try:
                with open(p, "rb") as f:
                    content = f.read()
            except OSError:
                continue  # deleted/unreadable between stat and read
            # tz-aware for the same session-zone reason as the batch read
            mod = datetime.fromtimestamp(st.st_mtime, tz=timezone.utc)
            yield (fn, p, mod, _file_type(fn), st.st_size, content)

    def read(self, start: dict):
        import time

        after = int(start.get("mtime_ns", -1))
        # end the batch at (now - grace), not at the max mtime seen: a file
        # whose mtime lands <= max-seen after the walk passed its directory
        # would otherwise be skipped forever
        end_ns = time.time_ns() - self.grace_ns
        if end_ns <= after:
            return iter([]), start
        rows = list(self._rows(self._scan(after, end_ns)))
        return iter(rows), {"mtime_ns": end_ns}

    def readBetweenOffsets(self, start: dict, end: dict):
        after = int(start.get("mtime_ns", -1))
        upto = int(end.get("mtime_ns", -1))
        return self._rows(self._scan(after, upto))


class DocumentCatalogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "document_catalog"

    def schema(self) -> str:
        return CATALOG_SCHEMA

    def reader(self, schema) -> DocumentCatalogReader:
        return DocumentCatalogReader(self.options)

    def simpleStreamReader(self, schema) -> DocumentCatalogStreamReader:
        return DocumentCatalogStreamReader(self.options)
