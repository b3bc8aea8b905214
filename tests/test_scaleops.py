"""Unit tests for the scale-path operators: salted skew join, Z-order
(Morton) layout keys, and binary (sign-bit) quantization."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from vectordb_data_ingestion_spark.functions.vectors import (
    binary_quantize,
    hamming_distance,
)
from vectordb_data_ingestion_spark.operators.layout import (
    morton_key,
    morton_key_sql,
    zorder_cluster,
)
from vectordb_data_ingestion_spark.operators.skew import salted_join


@pytest.fixture
def skewed(spark):
    # 90% of facts share one hot key — the shape salting exists for
    facts = spark.createDataFrame(
        [Row(fid=i, k="hot" if i % 10 else f"cold{i}", v=i * 2)
         for i in range(100)]
    )
    dim = spark.createDataFrame(
        [Row(k="hot", w=7)]
        + [Row(k=f"cold{i}", w=i) for i in range(0, 100, 10)]
        + [Row(k="unmatched", w=-1)]
    )
    return facts, dim


def test_salted_join_equals_plain_inner(spark, skewed):
    facts, dim = skewed
    got = salted_join(facts, dim, key="k", fact_id="fid", n_salt=8)
    want = facts.join(dim, "k")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_salted_join_equals_plain_left(spark, skewed):
    facts, dim = skewed
    # drop a key from dim so left-join null rows exist
    dim2 = dim.filter(F.col("k") != "cold10")
    got = salted_join(facts, dim2, key="k", fact_id="fid", n_salt=4, how="left")
    want = facts.join(dim2, "k", "left")
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, want.collect()), key=repr
    )


def test_salted_join_spreads_hot_key(spark, skewed):
    facts, dim = skewed
    salted = facts.withColumn(
        "__salt", F.pmod(F.hash(F.col("fid")), F.lit(8))
    )
    n_salts = (
        salted.filter(F.col("k") == "hot")
        .select("__salt").distinct().count()
    )
    assert n_salts > 4  # the hot key really fans out over sub-keys


def test_salted_join_rejects_other_how(spark, skewed):
    facts, dim = skewed
    with pytest.raises(ValueError):
        salted_join(facts, dim, key="k", fact_id="fid", how="full")


def test_morton_known_values(spark):
    df = spark.createDataFrame([Row(x=3, y=5), Row(x=0, y=0), Row(x=7, y=7)])
    got = [
        r[0]
        for r in df.select(
            morton_key(F.col("x"), F.col("y"), 3)
        ).collect()
    ]
    # x=3(011),y=5(101): bits -> 1 + 2 + 4 + 32 = 39; x=y=7 -> 63
    assert got == [39, 0, 63]


def test_morton_sql_matches_spark(spark):
    import duckdb

    rows = [(x, y) for x in range(9) for y in range(9)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y"), 4).alias("z")
        ).collect()
    }
    sql = morton_key_sql("x", "y", 4)
    want = {
        (x, y): z
        for x, y, z in duckdb.connect()
        .execute(
            "SELECT x, y, " + sql + " FROM (SELECT unnest(range(9)) x) "
            "CROSS JOIN (SELECT unnest(range(9)) y)"
        )
        .fetchall()
    }
    assert got == want


def test_zorder_cluster_buckets_are_contiguous(spark):
    rows = [(u, d) for u in range(16) for d in range(16)]
    df = spark.createDataFrame(rows, ["u", "d"])
    clustered = zorder_cluster(
        df, F.col("u"), F.col("d"), bits=4, n_files=4
    )
    per_part = clustered.select(
        F.spark_partition_id().alias("p"), "zkey"
    ).groupBy("p").agg(
        F.min("zkey").alias("lo"), F.max("zkey").alias("hi"),
        F.count("*").alias("n"),
    ).collect()
    # range partitions: z-intervals must not overlap across files
    spans = sorted((r["lo"], r["hi"]) for r in per_part)
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2
    assert sum(r["n"] for r in per_part) == 256


def test_binary_quantize_known_word(spark):
    df = spark.createDataFrame(
        [Row(v=[1.0, -1.0, 0.0, 2.0])]
    )
    got = df.select(
        binary_quantize(F.col("v"), dim=4, word_bits=4).alias("w")
    ).first()["w"]
    assert got == [9]  # bits 0 and 3 set


def test_hamming_distance_basic(spark):
    df = spark.createDataFrame([Row(a=[9, 0], b=[8, 3])])
    got = df.select(
        hamming_distance(F.col("a"), F.col("b")).alias("h")
    ).first()["h"]
    assert got == 3  # 9^8=1 (1 bit), 0^3=3 (2 bits)


def test_zone_map_prunes_files_under_zorder(spark, tmp_path):
    """The measured file-skip claim behind the z-order layout (verdict r3
    item 7): for the SAME data written as 16 files hash-scattered vs 16
    files z-clustered, a lakehouse zone map (per-file min/max) must admit
    strictly fewer candidate files under z-order for a point predicate on
    EITHER dimension — the bounding rectangles are tight in both."""
    from vectordb_data_ingestion_spark.operators.layout import zone_map

    rows = [(u, d) for u in range(64) for d in range(64)]
    df = spark.createDataFrame(rows, ["u", "d"])

    scattered_dir = str(tmp_path / "scattered")
    clustered_dir = str(tmp_path / "clustered")
    df.repartition(16, F.col("u") + F.col("d") * 64).write.parquet(
        scattered_dir
    )
    zorder_cluster(
        df, F.col("u"), F.col("d"), bits=6, n_files=16
    ).write.parquet(clustered_dir)

    def candidates(path, col, val):
        back = spark.read.parquet(path).select(
            F.col("_metadata.file_path").alias("f"), "u", "d"
        )
        zm = zone_map(back, "f", ["u", "d"]).collect()
        total = len(zm)
        hits = [
            r for r in zm if r[f"{col}_min"] <= val <= r[f"{col}_max"]
        ]
        return len(hits), total

    for col, val in (("u", 17), ("d", 42)):
        hit_s, tot_s = candidates(scattered_dir, col, val)
        hit_c, tot_c = candidates(clustered_dir, col, val)
        assert tot_s >= 8 and tot_c >= 8  # both layouts really multi-file
        # hash-scattered files each span ~the full domain: no pruning
        assert hit_s == tot_s
        # z-clustered files have tight rectangles: strict pruning on BOTH
        # dimensions (not just the range-partitioned major one)
        assert hit_c < tot_c, (col, hit_c, tot_c)
        assert hit_c <= tot_c // 2, (col, hit_c, tot_c)


def test_recommend_n_salt_wires_report_to_remedy(spark, skewed):
    """recommend_n_salt turns key_skew_report numbers into the n_salt the
    join needs; the recommended join still equals the plain join."""
    from vectordb_data_ingestion_spark.operators.skew import recommend_n_salt

    # the round-4 drill's shape: 900k-row hot key, 20k median
    assert recommend_n_salt(900_000, 20_000) == 12
    # uniform keys: no salt (and n_salt=1 degrades to the plain join)
    assert recommend_n_salt(1_000, 1_000) == 1
    # clamp: a pathological hot key never explodes the dim replication
    assert recommend_n_salt(10**9, 10) == 64
    # explicit cluster-derived target wins over the median heuristic
    assert recommend_n_salt(900_000, 20_000, target_rows_per_reducer=100_000) == 9

    facts, dim = skewed
    counts = (
        facts.groupBy("k").count().agg(
            F.max("count").alias("mx"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY count)")
            .alias("md"),
        ).collect()[0]
    )
    n = recommend_n_salt(counts["mx"], counts["md"])
    assert n >= 2  # the 90%-hot fixture really triggers salting
    plain = sorted(
        tuple(r)
        for r in facts.join(dim, "k").select("fid", "k", "v", "w").collect()
    )
    rec = sorted(
        tuple(r)
        for r in salted_join(facts, dim, key="k", fact_id="fid", n_salt=n)
        .select("fid", "k", "v", "w")
        .collect()
    )
    assert rec == plain


def test_aqe_skew_split_vs_explicit_salting_boundary(spark):
    """Pin the division of labor that operators/skew.py documents: AQE's
    skew-join split rescues a TERMINAL skewed sort-merge join (the final
    plan shows ``SortMergeJoin(skew=true)``), but when the same join feeds
    a downstream operator keyed on the join key, AQE declines to split
    (splitting would break the reusable hash partitioning and force an
    extra exchange) — and THAT is the deployment where the explicit
    deterministic salt is the only fix."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1048576",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        facts = spark.range(0, 300_000).select(
            F.col("id").alias("fid"),
            F.when(F.col("id") % 10 != 0, F.lit("hot"))
            .otherwise((F.col("id") % 97).cast("string"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        ).localCheckpoint()
        dim = facts.groupBy("k").count().localCheckpoint()

        # terminal skewed join: AQE splits the hot partition
        terminal = facts.join(dim, "k")
        terminal.foreach(lambda r: None)
        plan = terminal._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan

        # the same join feeding a same-key aggregate: no split — the
        # documented case for operators/skew.py::salted_join
        downstream = (
            facts.join(dim, "k").groupBy("k")
            .agg(F.sum("count").alias("s"))
        )
        downstream.foreach(lambda r: None)
        plan2 = downstream._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan2
        assert "skew=true" not in plan2
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
