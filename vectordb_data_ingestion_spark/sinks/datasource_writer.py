"""Vector-store sink as a Spark 4 Python DataSource *writer*.

``BatchingClientSink`` (vector_store.py) is the ``foreachPartition`` form of
the reference's ``data_load_weaviate`` loop (cmfunctions.py:177-223); it adds
batching, backoff and idempotent ids, but inherits the loop's weakest
property: a task that fails AFTER some batches flushed leaves them visible
(the retry re-upserts idempotently, but a killed job leaves a partial load).

This module is the two-phase form: ``df.write.format("vector_store")`` spools
each task's batches to an uncommitted staging area and returns a
``WriterCommitMessage``; only when EVERY task succeeded does the driver-side
``commit`` publish a manifest making the load visible. ``abort`` removes the
spool — a failed or cancelled job leaves nothing visible. That is the same
commit protocol Spark's file sinks use, expressed over a vector-store-shaped
payload (one JSON object per chunk row: id, properties, vector).

The staging substrate here is a directory (hermetic, testable); a real
deployment points the same protocol at a store with staged-collection or
alias-swap support (e.g. load into ``class__staging``, alias-flip on commit).
``read_committed`` is the read side of the contract: only manifest-listed
spool files count.
"""

from __future__ import annotations

import contextlib
import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_committed_manifest.jsonl"
_LOCKFILE = "_manifest.lock"


@contextlib.contextmanager
def _manifest_lock(path: str):
    """Exclusive advisory lock serialising manifest read-modify-replace.

    Append-mode commit is a read + atomic-replace (crash-safe against
    truncated lines), which means two jobs committing to the same sink path
    concurrently would otherwise race: the loser's manifest lines vanish,
    and a later vacuum() permanently deletes its committed spool files.
    flock on a sidecar file (NOT the manifest itself — os.replace would
    swap the locked inode out from under the lock) makes the section
    mutually exclusive per host; a real multi-driver deployment would use
    the store's own transactional swap instead (see module docstring).
    """
    os.makedirs(path, exist_ok=True)
    fd = os.open(os.path.join(path, _LOCKFILE), os.O_CREAT | os.O_RDWR)
    try:
        try:
            import fcntl

            fcntl.flock(fd, fcntl.LOCK_EX)
        except ImportError:  # non-POSIX: best-effort, same as before
            pass
        yield
    finally:
        os.close(fd)  # closing the fd releases the flock


@dataclass
class _SpoolCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class VectorStoreWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vector_store writer requires option 'path'")
        self.class_name = options.get("class_name", "Chunk")
        self.batch_size = int(options.get("batch_size", "150"))
        self.overwrite = overwrite

    # -- executor side --------------------------------------------------
    def write(self, iterator):
        spool = os.path.join(self.path, "_spool")
        os.makedirs(spool, exist_ok=True)
        fname = f"{uuid.uuid4().hex}.jsonl"
        n = 0
        batch: list[str] = []
        with open(os.path.join(spool, fname), "w") as f:
            for row in iterator:
                obj = row.asDict(recursive=True)
                batch.append(json.dumps({"class": self.class_name, **obj}))
                n += 1
                if len(batch) >= self.batch_size:
                    f.write("\n".join(batch) + "\n")
                    batch = []
            if batch:
                f.write("\n".join(batch) + "\n")
        return _SpoolCommit(filename=fname, n_rows=n)

    # -- driver side -----------------------------------------------------
    def commit(self, messages):
        manifest = os.path.join(self.path, MANIFEST)
        committed = {m.filename for m in messages if m is not None}
        lines = [
            json.dumps({"file": m.filename, "n_rows": m.n_rows}) + "\n"
            for m in messages
            if m is not None
        ]
        if self.overwrite:
            with _manifest_lock(self.path):
                # Retirement set = files the PREVIOUS manifest listed and
                # the new one doesn't. Deleting "everything not in the new
                # manifest" instead would destroy a concurrent job's
                # spooled-but-uncommitted files — it would then publish
                # manifest lines for files this commit deleted (review
                # r6). Orphans from dead tasks are vacuum()'s job, which
                # is documented quiescent-only.
                retire: set[str] = set()
                if os.path.exists(manifest):
                    with open(manifest) as f:
                        retire = {
                            json.loads(line)["file"]
                            for line in f
                            if line.strip()
                        } - committed
                # Publish the new manifest ATOMICALLY before retiring the
                # prior load's spool files: a crash mid-commit must leave
                # either the old manifest (all its files still present) or
                # the new one — never a manifest referencing deleted files.
                tmp = manifest + f".tmp.{uuid.uuid4().hex}"
                with open(tmp, "w") as f:
                    f.writelines(lines)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, manifest)
                spool = os.path.join(self.path, "_spool")
                for fn in retire:
                    try:
                        os.remove(os.path.join(spool, fn))
                    except FileNotFoundError:
                        pass
        else:
            # append via read + atomic replace, NOT a raw append: a crash
            # mid-append leaves a truncated JSON line that makes every
            # later read_committed()/vacuum() raise until hand-repaired.
            # The lock serialises concurrent appenders — without it the
            # read-modify-replace loser's commit silently vanishes.
            with _manifest_lock(self.path):
                existing = ""
                if os.path.exists(manifest):
                    with open(manifest) as f:
                        existing = f.read()
                tmp = manifest + f".tmp.{uuid.uuid4().hex}"
                with open(tmp, "w") as f:
                    f.write(existing)
                    f.writelines(lines)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, manifest)

    def abort(self, messages):
        spool = os.path.join(self.path, "_spool")
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(spool, m.filename))
            except FileNotFoundError:
                pass


class VectorStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "vector_store"

    def writer(self, schema, overwrite: bool) -> VectorStoreWriter:
        return VectorStoreWriter(self.options, overwrite)


def vacuum(path: str) -> int:
    """Remove spool files not listed in the manifest — the leftovers of
    tasks that died before returning a commit message (abort can only
    clean files it was TOLD about). Run only while no load is in flight
    (an in-flight task's spool file is not yet in any manifest, exactly
    like an orphan). Returns the number of files removed."""
    manifest = os.path.join(path, MANIFEST)
    spool = os.path.join(path, "_spool")
    if not os.path.isdir(spool):
        return 0
    with _manifest_lock(path):
        committed: set[str] = set()
        if os.path.exists(manifest):
            with open(manifest) as f:
                committed = {
                    json.loads(line)["file"] for line in f if line.strip()
                }
        removed = 0
        for fn in os.listdir(spool):
            if fn not in committed:
                try:
                    os.remove(os.path.join(spool, fn))
                    removed += 1
                except FileNotFoundError:
                    pass
    return removed


def read_committed(path: str) -> list[dict]:
    """The read side of the commit protocol: only spool files listed in the
    manifest are visible; orphaned spool files (from aborted or in-flight
    jobs) are ignored."""
    manifest = os.path.join(path, MANIFEST)
    if not os.path.exists(manifest):
        return []
    out: list[dict] = []
    with open(manifest) as mf:
        for line in mf:
            entry = json.loads(line)
            fp = os.path.join(path, "_spool", entry["file"])
            with open(fp) as f:
                out.extend(json.loads(l) for l in f if l.strip())
    return out
