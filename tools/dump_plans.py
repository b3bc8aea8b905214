"""Dump ``explain("formatted")`` for the named queries (default: every
bench headline query) into plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from vectordb_data_ingestion_spark import queries_catalog  # noqa: E402
from vectordb_data_ingestion_spark.plans import physical_plan  # noqa: E402
from vectordb_data_ingestion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"),
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or bench.HEADLINE
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    for name in names:
        df = queries_catalog.SPARK_QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok")


if __name__ == "__main__":
    main()
