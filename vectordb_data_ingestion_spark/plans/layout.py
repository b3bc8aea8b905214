"""Data-layout operators for 100 TB: bucketing and skew salting.

AQE (enabled in session.py) handles moderate skew at runtime; these helpers
cover the cases AQE can't:

- :func:`write_bucketed` — persist a table pre-hash-partitioned on its join
  key so repeated joins/aggregations on that key run shuffle-free (Spark
  bucketed scan). The chunk/vector table is re-joined on ``doc_id`` by
  every downstream consumer — bucket it once at ingest.
- :func:`salted_agg` — two-phase aggregation for heavy-hitter keys: salt
  the key into ``n_salts`` shards, partially aggregate, then merge. Turns
  one straggler reducer into ``n_salts`` even ones.
- :func:`salted_join` — skewed fact × small-ish dim equi-join: salt the
  fact side, explode the dim side across all salt values (dim is broadcast,
  so replication is free), join on (key, salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int = 64,
    sort_by: str | None = None,
    path: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Save as a bucketed managed table; subsequent equi-joins/groupBys on
    ``key`` between same-bucketed tables need no exchange."""
    writer = df.write.format(fmt).mode("overwrite").bucketBy(num_buckets, key)
    writer = writer.sortBy(sort_by or key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: Sequence[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe ``groupBy(key).agg(...)`` in two phases.

    ``aggs`` is ``[(fn, col, alias), ...]`` with fn in {sum, count, min,
    max}; these are the algebraic aggregates that re-merge cleanly (avg =
    sum/count at the call site)."""
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    partial_exprs = []
    for fn, col, alias in aggs:
        if fn not in merge_fn:
            raise ValueError(f"non-mergeable aggregate: {fn}")
        partial_exprs.append(getattr(F, fn)(col).alias(alias))
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    final_exprs = [
        getattr(F, merge_fn[fn])(alias).alias(alias) for fn, _, alias in aggs
    ]
    return partial.groupBy(key).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed-fact equi-join: fact rows get a random salt; the (broadcast)
    dim side is exploded across every salt value so each (key, salt) shard
    joins locally. Use when one fact key dominates a partition and AQE's
    skew split isn't available (e.g. inside a stream).

    NOTE the deliberately distinct sibling
    ``operators/skew.py::salted_join``: that one salts by
    ``pmod(hash(fact_id), n)`` — partition-invariant and replay-stable,
    what the deterministic driver-checked queries use. This rand-salted
    form spreads rows without needing any id column; pick by whether
    replay determinism matters.

    Only fact-preserving joins are valid: the dim side is replicated
    ``n_salts`` times, so a right/full outer join would emit every
    unmatched dim row once PER SALT (silently wrong results)."""
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti"
    ):
        raise ValueError(
            f"salted_join(how={how!r}): the salt explode replicates dim "
            "rows, so dim-preserving joins (right/full) would duplicate "
            f"every unmatched dim row {n_salts}x — use a plain join there"
        )
    f = fact.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = f.join(broadcast(d), on=[key, "__salt"], how=how)
    return out.drop("__salt")


def zorder_key(cols: Sequence[Column], bits: int = 10) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    already-bucketized integer column. Rows sorted by this key cluster in
    EVERY interleaved dimension at once, so parquet row-group min/max stats
    prune multi-column predicate boxes - the single-column sort only ever
    prunes its leading dimension. (Same technique as Delta/Iceberg OPTIMIZE
    ZORDER, expressed as a plain column so any writer can use it.)

    Inputs must be non-negative ints already bucketed into < 2^bits values
    (quantile/range bucketing upstream); values beyond the range would
    silently alias, so callers clamp. Pure bit arithmetic - identical in
    DuckDB for oracle checks (:func:`zorder_key_sql`).
    """
    n = len(cols)
    if bits < 1 or bits * n > 63:
        # bits*n = 64 would shift a bit into the long sign position:
        # negative keys break repartitionByRange's clustering silently
        raise ValueError(
            f"zorder_key: bits={bits} x {n} cols must stay within a "
            "63-bit positive long"
        )
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            key = key + F.shiftleft(
                F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                i * n + j,
            )
    return key


def zorder_key_sql(exprs: Sequence[str], bits: int = 10) -> str:
    n = len(exprs)
    terms = [
        f"(((CAST({e} AS BIGINT) >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, e in enumerate(exprs)
    ]
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[Column],
    bits: int = 10,
    num_files: int | None = None,
) -> None:
    """Write parquet clustered on the Z-order curve: range-partition by the
    key (balanced files), sort within partitions (tight row-group min/max
    stats on every interleaved dimension). Readers need nothing special -
    plain parquet scans prune row groups via pushed predicates."""
    keyed = df.withColumn("__zkey", zorder_key(cols, bits))
    parts = keyed.repartitionByRange(
        *([num_files, "__zkey"] if num_files else ["__zkey"])
    )
    parts.sortWithinPartitions("__zkey").drop("__zkey").write.mode(
        "overwrite"
    ).parquet(path)


def plan_compaction(
    files: DataFrame,
    size_col: str,
    group_cols: Sequence[str],
    target_bytes: int,
    order_col: str = "name",
) -> DataFrame:
    """Small-file compaction plan (the Delta/Iceberg OPTIMIZE bin-packing
    step as a plain query): within each ``group_cols`` partition, walk files
    in deterministic ``order_col`` order and fill bins greedily to
    ``target_bytes`` — ``bin = floor((cumulative - size) / target)``, i.e. a
    file opens a new bin exactly when the running total before it has
    crossed the next target boundary. A file larger than the target gets a
    bin of its own (bins may overflow by less than one file — the standard
    greedy guarantee).

    Returns the input plus ``compaction_bin`` — the rewrite task id a
    compactor would execute per ``(group, bin)``.

    Scale shape: one window per partition group (hash-partitioned by
    ``group_cols``, the same key the table is stored under); no global
    sort, no driver-side file listing walk. 100 TB of file metadata is
    still millions of rows at most — window-friendly."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(size_col)).over(w)
    return files.withColumn(
        "compaction_bin",
        F.floor((cum - F.col(size_col)) / F.lit(int(target_bytes))).cast(
            "long"
        ),
    )


def execute_compaction(
    spark,
    plan: DataFrame,
    out_dir: str,
    path_col: str = "path",
    bin_col: str = "compaction_bin",
    group_cols: Sequence[str] = (),
) -> int:
    """Execute a :func:`plan_compaction` plan: each (group, bin) of small
    files is read together and rewritten as ONE file — the Delta/Iceberg
    OPTIMIZE rewrite step. Returns the number of rewrite tasks run.

    The plan is file METADATA (one row per file), so collecting it
    driver-side is the same scale as any table's file listing; the
    rewrites themselves are Spark jobs over the files' bytes. Rewrite
    tasks are independent — a deployment runs them concurrently (thread
    pool over Spark jobs) and commits the swap atomically in its table
    format; here they run sequentially and land under
    ``out_dir/<group=...>/bin=N`` for inspection."""
    rows = plan.select(*group_cols, bin_col, path_col).collect()
    groups: dict = {}
    for r in rows:
        key = tuple(r[c] for c in group_cols) + (r[bin_col],)
        groups.setdefault(key, []).append(r[path_col])
    for key in sorted(groups):
        paths = groups[key]
        sub = "/".join(
            [f"{c}={v}" for c, v in zip(group_cols, key[:-1])]
            + [f"bin={key[-1]}"]
        )
        (
            spark.read.parquet(*paths)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{sub}")
        )
    return len(groups)
