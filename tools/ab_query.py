"""Calibrated A/B of individual queries: construct/execute decomposition.

For each named query, runs 1 discarded warm-up then N timed rounds, timing
``fn(spark, sf_dir)`` (driver-side plan construction) separately from the
noop-sink action (execution). Prints per-query medians plus the bench's
CPU-calibration anchor so cross-run comparisons can be host-normalized.

Usage: python tools/ab_query.py [-n RUNS] <query> [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_data_ingestion_spark import queries_catalog  # noqa: E402
from vectordb_data_ingestion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n_runs = 5
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    spark = get_spark(
        app_name="ab_query",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def calibration() -> float:
        def run() -> float:
            t0 = time.perf_counter()
            spark.range(0, 2_000_000_000, 1, 32).selectExpr(
                "bit_xor(xxhash64(id)) as h"
            ).collect()
            return time.perf_counter() - t0

        run()
        return round(statistics.median(run() for _ in range(3)), 3)

    # warm the JVM once
    queries_catalog.SPARK_QUERIES["pricing_summary"](spark, SF_DIR).count()
    cal = calibration()
    print(f"calibration_cpu_s={cal}")
    for name in args:
        fn = queries_catalog.SPARK_QUERIES[name]
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm-up
        cons, execs, totals = [], [], []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
            totals.append(t2 - t0)
        print(
            f"{name}: total={statistics.median(totals):.3f} "
            f"construct={statistics.median(cons):.3f} "
            f"execute={statistics.median(execs):.3f} "
            f"spread={max(totals) - min(totals):.3f} n={n_runs}"
        )
    print(f"calibration_cpu_end_s={calibration()}")


if __name__ == "__main__":
    main()
