"""Per-stage empirical profile of one or more headline queries (guide §1/§7).

Runs each named query once warm + once measured with the Spark UI enabled,
then pulls per-stage metrics from the status REST API and prints, per query,
the stages ordered by executorRunTime with shuffle read/write bytes and task
counts. This answers "where does the wall-clock actually go" — the Stages
tab of the UI, scripted.

Usage: python tools/profile_query.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_data_ingestion_spark import queries_catalog  # noqa: E402
from vectordb_data_ingestion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def api(url: str):
    with urllib.request.urlopen(url) as resp:
        return json.loads(resp.read())


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(
        app_name="profile_query",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # warm the session once
    queries_catalog.SPARK_QUERIES["pricing_summary"](spark, SF_DIR).count()

    for name in names:
        fn = queries_catalog.SPARK_QUERIES[name]
        force(fn(spark, SF_DIR))  # warm-up
        jobs_before = {j["jobId"] for j in api(f"{base}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        force(fn(spark, SF_DIR))
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        new_jobs = [j for j in api(f"{base}/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in new_jobs for s in j["stageIds"]})
        rows = []
        for sid in stage_ids:
            try:
                for att in api(f"{base}/stages/{sid}"):
                    if att["status"] == "SKIPPED":
                        continue
                    rows.append(att)
            except Exception:
                continue
        rows.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name}: wall {wall:.3f}s, {len(new_jobs)} jobs, "
              f"{len(rows)} executed stages ===")
        tot = sum(s.get("executorRunTime", 0) for s in rows)
        print(f"  total executorRunTime {tot/1000.0:.2f}s (sum over tasks)")
        for s in rows[:12]:
            print(
                "  stage {id:>4} tasks={t:<4} run={run:>7.2f}s cpu={cpu:>7.2f}s "
                "in={inp:>8} sh_r={sr:>8} sh_w={sw:>8} spill={sp:>6} | {nm}".format(
                    id=s["stageId"],
                    t=s["numCompleteTasks"],
                    run=s.get("executorRunTime", 0) / 1000.0,
                    cpu=s.get("executorCpuTime", 0) / 1e9,
                    inp=_fmt(s.get("inputBytes", 0)),
                    sr=_fmt(s.get("shuffleReadBytes", 0)),
                    sw=_fmt(s.get("shuffleWriteBytes", 0)),
                    sp=_fmt(s.get("diskBytesSpilled", 0)),
                    nm=(s.get("description") or s.get("name", ""))[:80],
                )
            )


def _fmt(n: int) -> str:
    for unit in ("B", "K", "M", "G"):
        if n < 1024:
            return f"{n:.0f}{unit}"
        n /= 1024.0
    return f"{n:.1f}T"


if __name__ == "__main__":
    main()
