"""File-backed fake vector-store client for hermetic sink testing.

Implements the :class:`~vectordb_data_ingestion_spark.sinks.vector_store.
VectorClient` protocol on top of a shared directory, so it works across
executor python workers in local mode (each add_batch writes its own file -
no shared memory needed). Lives in the package (not tests/) because
foreachPartition pickles the client factory by module reference and executor
workers can only import installed/package modules.
"""

from __future__ import annotations

import glob
import json
import os
import uuid


class FileBackedClient:
    def __init__(self, base_dir: str, fail_first: int = 0):
        self.base_dir = base_dir
        self.fail_first = fail_first

    def _marker(self) -> str:
        return os.path.join(self.base_dir, "failures")

    def ensure_class(self, class_name: str, properties: list[dict]) -> None:
        with open(os.path.join(self.base_dir, f"_class_{class_name}"), "w") as f:
            json.dump(properties, f)

    def add_batch(self, class_name: str, objects: list[dict]) -> None:
        # simulate transient failures: the first ``fail_first`` calls raise,
        # tracked on disk so the count is shared across worker processes
        if self.fail_first:
            os.makedirs(self.base_dir, exist_ok=True)
            fails = len(glob.glob(self._marker() + "*"))
            if fails < self.fail_first:
                open(f"{self._marker()}{fails}_{uuid.uuid4().hex}", "w").close()
                raise ConnectionError("transient store failure")
        path = os.path.join(self.base_dir, f"batch_{uuid.uuid4().hex}.jsonl")
        with open(path, "w") as f:
            for obj in objects:
                f.write(json.dumps(obj) + "\n")

    def delete_where(self, class_name: str, path_col: str, values: list) -> None:
        for fp in glob.glob(os.path.join(self.base_dir, "batch_*.jsonl")):
            kept = []
            with open(fp) as f:
                for line in f:
                    obj = json.loads(line)
                    if obj["properties"].get(path_col) not in values:
                        kept.append(line)
            with open(fp, "w") as f:
                f.writelines(kept)

    @staticmethod
    def read_objects(base_dir: str) -> list[dict]:
        out = []
        for fp in glob.glob(os.path.join(base_dir, "batch_*.jsonl")):
            with open(fp) as f:
                out.extend(json.loads(line) for line in f)
        return out
