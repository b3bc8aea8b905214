"""Hot-key skew drill: measure what salting actually buys on a skewed
shuffle join (round-3 verdict item 5).

Builds a deliberately hot-keyed derivative of the sf0.1 events table
(90% of rows collapse onto ONE event_type, grown 10x by id-offset
self-union, ~1M facts), then runs the same fact->dim equi-join two ways
under the shuffle-join regime (broadcast disabled, AQE skew-join
mitigation disabled, so the drill measures the OPERATOR, not the
planner's rescue):

- plain join on ``event_type``  -> one reducer owns the hot key
- ``operators/skew.py::salted_join`` (n_salt=8) -> the hot key spreads
  over 8 reducers

Reported per variant: wall seconds (min of 2), and the max/median rows
per output partition — the reducer-flattening evidence (max-task row
share is the proxy for max task time; per-task wall isn't exposed to
PySpark without an event-log listener).

Usage: python skew_drill.py   (one JSON line; recorded in BENCH_NOTES.md)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.operators.skew import salted_join
from vectordb_data_ingestion_spark.session import get_spark, load_tables

SF_DIR = "/root/testdata/sf0.1"
GROW = 10
N_SALT = 8


def build_hot_facts(spark):
    from scale_probe import grow_by_id_offset

    ev = load_tables(spark, SF_DIR, ("events",))["events"]
    max_ev = ev.agg(F.max("event_id")).first()[0] + 1
    grown = grow_by_id_offset(ev, "event_id", GROW, max_ev)
    # 90% of facts collapse onto one hot type; the rest keep their own
    hot = grown.withColumn(
        "event_type",
        F.when(F.col("event_id") % 10 != 0, F.lit("hot")).otherwise(
            F.col("event_type")
        ),
    ).select("event_id", "event_type", "value")
    return hot.localCheckpoint()  # freeze: both variants join identical data


def partition_profile(df):
    rows = (
        df.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .count()
        .collect()
    )
    counts = sorted((r["count"] for r in rows), reverse=True)
    return {
        "partitions": len(counts),
        "max_rows": counts[0],
        "median_rows": int(statistics.median(counts)),
        "max_share": round(counts[0] / sum(counts), 3),
    }


def timed(df):
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    spark = get_spark(app_name="skew_drill")
    spark.sparkContext.setLogLevel("ERROR")
    # shuffle-join regime: no broadcast rescue, no AQE skew-split rescue —
    # the drill isolates what the explicit salt buys when the planner can't
    # help (the exact deployment salted_join documents)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    facts = build_hot_facts(spark)
    dim = (
        facts.groupBy("event_type")
        .agg(F.count("*").alias("n_type"))
        .localCheckpoint()
    )
    n_facts = facts.count()

    plain = facts.join(dim, "event_type").select(
        "event_id", "event_type", "value", "n_type"
    )
    salted = salted_join(
        facts, dim, key="event_type", fact_id="event_id", n_salt=N_SALT
    )

    result = {
        "metric": "skew_drill",
        "n_facts": n_facts,
        "hot_share": 0.9,
        "n_salt": N_SALT,
        "plain": {
            "wall_sec": timed(plain),
            **partition_profile(plain),
        },
        "salted": {
            "wall_sec": timed(salted),
            **partition_profile(salted),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
