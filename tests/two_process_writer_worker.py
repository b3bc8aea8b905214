"""Subprocess worker for the cross-process two-phase-writer commit race
(tests/test_multiprocess_sinks.py::test_two_process_writer_commits). No
Spark involved — the writer's write/commit are plain methods; what is
under test is the CAS manifest publication across REAL processes sharing
one FileConditionalStore (flock is a cross-process primitive; the thread
tests can't exercise that).

    python two_process_writer_worker.py <path> <worker_id> <n_commits>
"""

import sys


def main() -> int:
    path, wid, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from pyspark.sql import Row

    from vectordb_data_ingestion_spark.sinks.datasource_writer import (
        VectorStoreWriter,
    )

    w = VectorStoreWriter({"path": path, "class_name": "Chunk"}, False)
    for i in range(n):
        msg = w.write(iter([Row(chunk_id=f"{wid}-{i}", text=f"t-{wid}-{i}")]))
        w.commit([msg])
    return 0


if __name__ == "__main__":
    sys.exit(main())
