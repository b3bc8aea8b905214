"""Manifest-sink segment-growth probe — the read-cost axis the delete
probe doesn't measure: every mutation appends a segment, and every
segment adds a scan branch to every read (the commit-log analogue of the
streaming index's batch-count small-files growth,
tools/probe_streaming_state.py). This measures read latency at growing
segment counts and the reset `maybe_compact` buys.

Method: K micro-batch upserts (data volume grows WITH the axis — each
batch appends rows, as a real refresh does), read-noop timed at
checkpoints, then compacted and re-timed. The controlled segment-count
comparison is the LAST pair: read at K segments vs read after compaction
— same rows, same bytes, 1 segment — so `segment_overhead_at_max` isolates
the scan-branch cost from data growth.

Writes one JSON line; findings go to BENCH_NOTES.md / SCALE.md.

Usage: python tools/probe_manifest_segments.py [rows_per_batch] [batches]
       (defaults 20000, 64)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from vectordb_data_ingestion_spark.session import get_spark  # noqa: E402
from vectordb_data_ingestion_spark.sinks.manifest_sink import (  # noqa: E402
    ManifestVectorSink,
)


def batch_df(spark, start: int, n: int):
    return spark.range(start, start + n).select(
        F.concat(F.lit("c"), F.col("id")).alias("chunk_id"),
        F.concat(F.lit("payload "), F.col("id")).alias("text"),
    )


def timed_read(sink, runs: int = 3) -> float:
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        sink.read().write.format("noop").mode("overwrite").save()
        times.append(time.monotonic() - t0)
    times.sort()
    return round(times[len(times) // 2], 3)


def main() -> None:
    per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="probe-manifest-segments")
    root = tempfile.mkdtemp(prefix="manifest_seg_probe_")
    curve: dict[str, float] = {}
    try:
        sink = ManifestVectorSink(
            spark, f"{root}/sink", partition_col=None,
            key_col="chunk_id", n_buckets=16,
        )
        checkpoints = {1, 4, 16, batches}
        for i in range(batches):
            sink.upsert(batch_df(spark, i * per_batch, per_batch))
            if (i + 1) in checkpoints:
                curve[f"read_at_{i + 1}_segments"] = timed_read(sink)
                print(
                    f"{i + 1} segments: read {curve[f'read_at_{i + 1}_segments']} s",
                    flush=True,
                )
        merged = sink.maybe_compact(max_segments=8)
        curve["read_after_compact"] = timed_read(sink)
        print(
            f"compacted {merged} segments: read {curve['read_after_compact']} s",
            flush=True,
        )
        print(json.dumps({
            "metric": "manifest_segment_growth_probe",
            "rows_per_batch": per_batch,
            "batches": batches,
            "unit": "sec",
            "curve": curve,
            # data grew ~`batches`x along this axis too — NOT a pure
            # segment-overhead number
            "read_growth_with_data_and_segments": round(
                curve[f"read_at_{batches}_segments"]
                / curve["read_at_1_segments"], 2
            ),
            # same data, 1 segment vs `batches` segments: the isolated
            # scan-branch overhead maybe_compact resets
            "segment_overhead_at_max": round(
                curve[f"read_at_{batches}_segments"]
                / curve["read_after_compact"], 2
            ),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
