"""Scale-linearity probe: do the expensive operators' cost curves stay
linear-ish when the corpus grows past sf0.1?

No larger driver scale factor exists, so the probe DERIVES bigger corpora
from /root/testdata/sf0.1 by self-union with disjoint content per copy:

- ``doc_id`` / ``vec_id`` are offset per copy (ids stay unique),
- every word of copy *i* gets a ``·ci`` suffix, so cross-copy shingle /
  token overlap is ZERO — each copy is an internally-identical but
  mutually-disjoint corpus. Duplicate-pair counts, posting lists, and
  candidate sets therefore scale linearly by construction, and any
  super-linear runtime is the ENGINE's fault (a shuffle, a quadratic
  candidate set, a driver collect), which is exactly what we want to catch.
  (Naive replication would be wrong: identical copies land in the same
  LSH buckets and near-dup pair counts grow k^2 per group — measuring the
  data, not the engine.)

Usage: python scale_probe.py [multipliers...]   (default 1 2 4)
Writes one JSON line; findings are recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from vectordb_data_ingestion_spark import queries_catalog
from vectordb_data_ingestion_spark.session import get_spark, load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The 5 most expensive headline operators (BENCH_r01) + the BM25 index path.
PROBE = [
    "minhash_lsh_near_dup",
    "near_dup_dedup",
    "bm25_topk",
    "hybrid_rrf_search",
    "ann_topk_batch",
    "repetition_signals",
    # round-2 heavy additions: windowed span removal (explode + 2 hash
    # shuffles) and tokenizer train+apply (word-count shuffle + cached map)
    "dup_span_removal",
    "bpe_segment_tokens",
    # round-2 batch-3 heavy text aggregates: per-doc TF-IDF ranking and
    # PMI's double gram shuffle
    "doc_keywords_tfidf",
    "bigram_pmi",
    # round-2 batch-4 relational heavies: these scale with lineitem (the
    # fact side grows per copy, dimensions stay fixed — the realistic
    # fact/dim growth profile), so the probe multiplies orders+lineitem too
    "sole_late_supplier",
    "small_quantity_revenue",
    "nation_pair_volume",
    "cheapest_supplier_per_part",
    # late-round-2: the six-stage curation flagship and the fixed-eval-set
    # MRR scan (linear in the corpus once the query set is capped)
    "full_curation_pipeline",
    "retrieval_mrr_eval",
    # round-4: the remaining search-family paths — full-vocab TF-IDF
    # ranking and the materialized-postings BM25 (index build + probe)
    "tfidf_topk",
    "bm25_topk_indexed",
]

from vectordb_data_ingestion_spark.session import (  # noqa: E402
    ALL_TABLE_NAMES as ALL_TABLES,
)


def grow_by_id_offset(df, id_col: str, mult: int, max_id: int):
    """Self-union ``mult`` copies of ``df`` with ``id_col`` offset by
    ``i * max_id`` per copy — ids stay globally unique, per-key rollups
    scale linearly by construction. ``max_id`` is passed in (one
    ``F.max`` aggregate at the caller) so multiple tables can share one
    Spark action where their ids are co-keyed."""
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * max_id))
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_scaled_dir(spark, mult: int, root: str) -> str:
    # SCALE_PROBE_GROW=docs limits growth to documents+embeddings (the
    # x100 dedup decade doesn't need 60M synthetic lineitem rows written
    # just to symlink past them); default grows every fact table.
    grow = os.environ.get("SCALE_PROBE_GROW", "all")
    out = os.path.join(root, f"x{mult}")
    os.makedirs(out, exist_ok=True)
    tables = load_tables(spark, SF_DIR, ("documents", "embeddings"))
    docs, embs = tables["documents"], tables["embeddings"]
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    doc_parts = []
    for i in range(mult):
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "), lambda w: F.concat(w, F.lit(f"c{i}"))
            ),
            " ",
        )
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_doc))
        if i > 0:  # copy 0 keeps the original text (x1 == sf0.1 exactly)
            d = d.withColumn("text", suffixed)
        doc_parts.append(d)
    scaled_docs = doc_parts[0]
    for d in doc_parts[1:]:
        scaled_docs = scaled_docs.unionByName(d)
    scaled_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    # Embedding copies are DECORRELATED by a per-copy deterministic sign
    # flip (element j of copy i is multiplied by ±1 from hash(i, j)):
    # sign flips preserve every within-copy inner product exactly
    # (s_j^2 = 1), so each copy clusters/buckets internally like copy 0,
    # while cross-copy cosine between originally-identical vectors drops
    # to a ±v_j^2 random sum (~1/sqrt(dim) in magnitude) — far below any
    # near-dup threshold. Verbatim replication would instead hand every
    # point 99 cosine-1.0 twins at x100, and a semantic-dedup probe would
    # measure that duplicate mass (k^2 per group — the data), not the
    # engine. Copy 0 stays untouched (x1 == sf0.1 exactly).
    copy_no = (F.col("vec_id") / F.lit(max_doc)).cast("long")
    grow_by_id_offset(embs, "vec_id", mult, max_doc).withColumn(
        "embedding",
        F.when(copy_no == 0, F.col("embedding")).otherwise(
            F.transform(
                F.col("embedding"),
                lambda x, j: F.when(
                    F.pmod(
                        F.hash(F.concat_ws("_", copy_no, j)), 2
                    )
                    == 0,
                    x,
                ).otherwise(-x),
            )
        ),
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    if grow == "docs":
        for t in ALL_TABLES:
            dst = f"{out}/{t}.parquet"
            if not os.path.exists(dst):
                # absolute target: a relative SPARK_GRAFT_SF_DIR would
                # otherwise resolve relative to the link's directory and
                # dangle
                os.symlink(os.path.abspath(f"{SF_DIR}/{t}.parquet"), dst)
        return out

    # Fact-side growth for the relational probes: orderkeys offset per copy
    # (facts grow linearly, dimension tables stay fixed — per-order rollups
    # and per-part stats then scale linearly by construction).
    rel = load_tables(spark, SF_DIR, ("orders", "lineitem"))
    orders, li = rel["orders"], rel["lineitem"]
    max_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
    grow_by_id_offset(orders, "o_orderkey", mult, max_ord).write.mode(
        "overwrite"
    ).parquet(f"{out}/orders.parquet")
    grow_by_id_offset(li, "l_orderkey", mult, max_ord).write.mode(
        "overwrite"
    ).parquet(f"{out}/lineitem.parquet")

    # Event-fact growth (round-4: skew_salted_join / zorder_layout_plan
    # probes): event_id offset per copy; user_id and event_type stay fixed,
    # so per-type/per-user rollups grow linearly — and the type-key skew
    # profile is PRESERVED under growth, which is what the salted join's
    # cost curve must survive.
    ev = load_tables(spark, SF_DIR, ("events",))["events"]
    max_ev = ev.agg(F.max("event_id")).first()[0] + 1
    grow_by_id_offset(ev, "event_id", mult, max_ev).write.mode(
        "overwrite"
    ).parquet(f"{out}/events.parquet")
    for t in ALL_TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            # absolute target (same hazard as the grow=docs branch)
            os.symlink(os.path.abspath(f"{SF_DIR}/{t}.parquet"), dst)
    return out


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    # SCALE_PROBE_QUERIES=a,b,c restricts the probe (e.g. the ~sf1
    # fact-growth run targets only the TPC-H heavies — deriving a 10x
    # corpus for all 16 probes would mostly re-measure x4-confirmed ops)
    probe = PROBE
    subset = os.environ.get("SCALE_PROBE_QUERIES")
    if subset:
        probe = [q.strip() for q in subset.split(",") if q.strip()]
        unknown = [q for q in probe if q not in queries_catalog.SPARK_QUERIES]
        if unknown:
            raise SystemExit(f"unknown probe queries: {unknown}")
    try:
        mults = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    except ValueError:
        raise SystemExit(f"multipliers must be integers: {sys.argv[1:]}")
    if any(m < 1 for m in mults):
        raise SystemExit(f"multipliers must be >= 1: {mults}")
    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="scale_probe_")
    results: dict[str, dict[int, float]] = {q: {} for q in probe}
    try:
        for mult in mults:
            sf_dir = build_scaled_dir(spark, mult, root)
            for name in probe:
                fn = queries_catalog.SPARK_QUERIES[name]
                runs = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    force(fn(spark, sf_dir))
                    runs.append(time.perf_counter() - t0)
                results[name][mult] = round(min(runs), 3)
                print(
                    f"  x{mult} {name}: {results[name][mult]}s", file=sys.stderr
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)

    ratios = {
        q: round(results[q][mults[-1]] / results[q][mults[0]], 2)
        for q in probe
        if results[q].get(mults[0])
    }
    print(
        json.dumps(
            {
                "metric": "scale_probe_seconds",
                "multipliers": mults,
                "base_sf": 0.1,
                "queries": {q: results[q] for q in probe},
                "growth_ratio_last_over_first": ratios,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
