"""File-catalog operators (T1 lifecycle).

Parity targets: extension extraction (sharepointutils.py:103-108), delta
predicate (sharepointutils.py:158-161, 285-288), new/updated-file diff
(sharepointutils.py:169-186), seqno derivation (sharepointutils.py:162-165),
URL synthesis (sharepointutils.py:293-295).

Scale notes: the catalog is small relative to the corpus (one row per file),
so the incremental diff broadcasts the local catalog; the heavy side (remote
listing / corpus) streams through a broadcast hash join with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

# sharepointutils.py:105 pattern, as a capture group for regexp_extract.
FILETYPE_PATTERN = r"\.([a-zA-Z0-9]+)$"


def file_type(col: Column | str) -> Column:
    """Extension of a filename, without the dot (sharepointutils.py:103-108)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, FILETYPE_PATTERN, 1)


def distinct_file_types(df: DataFrame, name_col: str = "name") -> DataFrame:
    """``list_all_filetypes`` (sharepointutils.py:110-117) as a distinct."""
    return df.select(file_type(name_col).alias("file_type")).distinct()


def delta_filter(
    df: DataFrame, ts_col: str, load_dt: str
) -> DataFrame:
    """Keep rows modified strictly after the load watermark
    (sharepointutils.py:158-161: ``modified_dt > load_dt``). Catalyst pushes
    this predicate into the scan (partition pruning on a date-partitioned
    catalog)."""
    return df.filter(F.col(ts_col) > F.to_timestamp(F.lit(load_dt)))


def with_seqno(df: DataFrame, order_col: str, seqno_col: str = "index") -> DataFrame:
    """Deterministic sequence number (reference uses the pandas RangeIndex,
    sharepointutils.py:162-165). A global row_number needs a total order; the
    catalog is small so the single-partition window is fine. For corpus-scale
    frames prefer ``monotonically_increasing_id`` when only uniqueness
    matters."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col(order_col))
    return df.withColumn(seqno_col, (F.row_number().over(w) - 1).cast("int"))


def with_seqno_distributed(
    df: DataFrame,
    order_col: str | list[str],
    seqno_col: str = "index",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ordinal without a single-partition sort — the corpus-scale
    form of :func:`with_seqno`.

    Range-partition on ``order_col`` (one column or a list — parallel
    sort), count rows per partition (tiny job), broadcast the cumulative
    offsets, then number each partition locally with one Arrow pass. Two
    narrow passes over the data instead of funneling 100 TB through one
    reducer. Ordinals match ``ROW_NUMBER() OVER (ORDER BY order_cols)``
    whenever the order-column tuple is unique (ties fall to partition
    order, like any row_number tiebreak)."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint pins the partitioning/row placement: the count job and
    # the numbering pass must read the SAME materialization — re-executing a
    # non-deterministic lineage (fresh scan order, rand columns, ties on
    # order_col) could move rows between partitions and duplicate or skip
    # ordinals silently.
    ranged = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = dict(
        ranged.groupBy("__pid").count().orderBy("__pid").collect()
    )
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(
        df.schema.fields + [StructField(seqno_col, LongType())]
    )

    def number(batches):
        seen = 0
        base = None
        for pdf in batches:
            if pdf.empty:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns=["__pid"])
            pdf[seqno_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return ranged.mapInPandas(number, schema=out_schema)


def ntile_distributed(
    df: DataFrame,
    n: int,
    order_cols: list[str],
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order_cols)`` without a
    single-partition window: global ranks come from
    :func:`with_seqno_distributed` (range-partitioned parallel sort), the
    tile is then a pure expression of (rank, total) — the first
    ``total % n`` tiles get ``total // n + 1`` rows, exactly the SQL NTILE
    distribution. Give it a total order (tie-break by id) or tile
    membership is partition-dependent like any NTILE over ties."""
    ranked = with_seqno_distributed(
        df, order_cols, seqno_col="__rank0", num_partitions=num_partitions
    )
    # count the CHECKPOINTED ranked output, not df: df.count() would
    # re-execute the whole upstream lineage (e.g. a regex-heavy scoring
    # projection) a second time; ranked reads the materialized rows
    total = ranked.count()
    base, rem = total // n, total % n
    r = F.col("__rank0") + 1  # 1-based rank
    big = rem * (base + 1)  # rows covered by the (base+1)-sized tiles
    tile = F.when(
        r <= F.lit(big), F.ceil(r / F.lit(float(base + 1)))
    ).otherwise(
        F.lit(rem) + F.ceil((r - F.lit(big)) / F.lit(float(max(base, 1))))
    )
    return ranked.withColumn(out_col, tile.cast("int")).drop("__rank0")


def synthesize_url(
    df: DataFrame,
    domain: str,
    url_col: str = "url",
    name_col: str = "name",
    out_col: str = "full_url",
) -> DataFrame:
    """``domain + url + '/' + name`` (sharepointutils.py:293-295)."""
    return df.withColumn(
        out_col, F.concat(F.lit(domain), F.col(url_col), F.lit("/"), F.col(name_col))
    )


def find_new_and_updated(
    remote: DataFrame,
    local: DataFrame,
    name_col: str = "name",
    ts_col: str = "modified_dt",
) -> DataFrame:
    """Incremental-refresh diff (sharepointutils.py:169-186): keep remote rows
    whose name is absent from the local catalog (anti part) or whose local
    timestamp is strictly older (inequality part).

    One broadcast hash join; no shuffle of the remote side. Equivalent SQL:
    ``remote LEFT JOIN local USING(name) WHERE local.ts IS NULL OR
    local.ts < remote.ts``.
    """
    loc = broadcast(
        local.select(
            F.col(name_col).alias("__l_name"), F.col(ts_col).alias("__l_ts")
        )
    )
    joined = remote.join(loc, remote[name_col] == loc["__l_name"], "left")
    return joined.filter(
        F.col("__l_ts").isNull() | (F.col("__l_ts") < remote[ts_col])
    ).drop("__l_name", "__l_ts")


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Delta-style MERGE as keep-latest-per-key: the refreshed catalog is the
    union of the current snapshot and the update batch, keeping the newest
    row per key (sharepointutils.py:169-197 refreshes the catalog by diff +
    re-download; at warehouse scale the same refresh is a MERGE).

    One shuffle on the key: union is free, the window hash-partitions by
    ``key_cols`` once. Updates win ties (same ``ts_col``) so a re-delivered
    batch converges to the batch's value - the merge is idempotent:
    ``merge(merge(c, u), u) == merge(c, u)``.

    ``tiebreak_cols``: extra deterministic ordering after the update-wins
    flag, for inputs where (key, ts) is not unique.
    """
    upd = updates.withColumn("__is_update", F.lit(1))
    cur = current.withColumn("__is_update", F.lit(0))
    merged = cur.unionByName(upd)
    order = [F.col(ts_col).desc(), F.col("__is_update").desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__is_update")
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a change log: per key,
    collapse consecutive rows with an unchanged ``state_col`` and emit one
    validity interval ``[valid_from, valid_to)`` per distinct state run;
    ``valid_to`` is NULL on the current (open) interval.

    The catalog analogue of incremental refresh (SURVEY §3 E2): instead of
    overwriting ``modified_dt`` we keep every historical state with its
    validity window, so any past catalog snapshot is reconstructable with
    ``valid_from <= t AND (valid_to IS NULL OR valid_to > t)``.

    Both window passes partition by the same ``key_cols`` and order the same
    way, so Spark plans ONE exchange + one sort and runs both windows over
    it - the change-detect lag and the interval lead add no extra shuffle.
    """
    order = [F.col(ts_col), F.col(tiebreak_col)]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # Null-safe change detection: ``__prev != state`` is NULL (dropped) on a
    # transition INTO a NULL state, which would leave the prior interval
    # open and collapse NULL runs into the preceding state. eqNullSafe
    # treats NULL==NULL as a non-change (one interval per NULL run), and
    # the explicit first-row marker keeps keys whose FIRST state is NULL
    # (where lag-is-null alone can't tell "first row" from "prev was NULL").
    changed = (
        df.withColumn("__prev", F.lag(state_col).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col("__prev").eqNullSafe(F.col(state_col))
        )
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__prev", "__rn")
    )


# --- backfill planning -------------------------------------------------------

def missing_partitions(
    df: DataFrame,
    ts_col: str = "ts",
    granularity: str = "hour",
) -> DataFrame:
    """Backfill planner: which time partitions between the table's min and
    max are EMPTY? Builds the expected calendar with ``sequence()`` off the
    1-row min/max aggregate (never a driver loop), then anti-joins the
    partitions actually present — the standard late-landing-data /
    ingestion-gap audit before scheduling a backfill.

    Cost at 100 TB: one min/max aggregate over the (pruned, ts-only) scan,
    one distinct over truncated timestamps (map-side partial), and an anti
    join between two calendar-sized (tiny) tables."""
    trunc = F.date_trunc(granularity, F.col(ts_col))
    present = df.select(trunc.alias("part")).distinct()
    bounds = df.agg(
        F.date_trunc(granularity, F.min(ts_col)).alias("lo"),
        F.date_trunc(granularity, F.max(ts_col)).alias("hi"),
    )
    expected = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {granularity}"))
        ).alias("part")
    )
    return expected.join(present, "part", "left_anti")


def missing_partitions_sql(
    table: str, ts_expr: str = "ts", granularity: str = "hour"
) -> str:
    """DuckDB query matching :func:`missing_partitions`."""
    return f"""
    WITH bounds AS (
      SELECT date_trunc('{granularity}', MIN({ts_expr})) AS lo,
             date_trunc('{granularity}', MAX({ts_expr})) AS hi
      FROM {table}
    ), expected AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 {granularity})) AS part
      FROM bounds
    ), present AS (
      SELECT DISTINCT date_trunc('{granularity}', {ts_expr}) AS part
      FROM {table}
    )
    SELECT e.part FROM expected e
    WHERE NOT EXISTS (SELECT 1 FROM present p WHERE p.part = e.part)
    """


# --- semi-structured quarantine scan ----------------------------------------

def parse_json_quarantine(
    df: DataFrame,
    json_col: str,
    schema: str,
    quarantine_col: str = "_corrupt",
) -> DataFrame:
    """Parse a JSON string column against ``schema``, routing malformed
    payloads to a quarantine column instead of dropping them silently (the
    `badRecordsPath` pattern applied to an in-flight column): well-formed
    rows get the parsed struct fields, malformed rows keep the raw string
    in ``quarantine_col`` for a dead-letter sink. ``from_json`` is
    PERMISSIVE (an all-null struct, NOT a null struct, on corrupt input),
    so detection goes through the parser's own corrupt-record channel: the
    schema gains a ``columnNameOfCorruptRecord`` field the parser fills
    only for malformed payloads. One narrow projection — no UDF, no second
    scan. Split the result with ``.filter(col(quarantine_col).isNull())``
    / ``.isNotNull()`` for the good/dead-letter branches."""
    parsed = F.from_json(
        F.col(json_col),
        f"{schema}, {quarantine_col} string",
        {"columnNameOfCorruptRecord": quarantine_col},
    )
    return (
        df.withColumn("__parsed", parsed)
        .select(
            *[c for c in df.columns],
            F.col("__parsed")
            .dropFields(quarantine_col)
            .alias(f"{json_col}_parsed"),
            F.col(f"__parsed.{quarantine_col}").alias(quarantine_col),
        )
    )
