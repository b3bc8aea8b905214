"""LSH banding-knob probe (verdict r4 item 7): show that rows-per-band
bounds candidate-pair growth under CONTROLLED duplicate mass.

The disjoint-growth scale probe makes pair counts linear by construction,
so it cannot exercise the knob. This probe builds the opposite corpus: 10
copies of sf0.1 documents where ~10% of words (chosen by content hash, so
the SAME words in every copy) get a per-copy suffix. Word-level mutation
compounds at the 3-gram shingle level (a shingle breaks if ANY of its 3
words mutated): 10% word mutation -> ~0.9^3 = 73% shared shingles ->
cross-copy shingle-Jaccard ~ 0.57. A moderate-similarity swarm like this
(every base doc spawns a 10-clique of s~0.57 neighbors) is exactly what
saturates candidate generation in a web corpus; the banding knob is the
control:

  P(candidate | s) = 1 - (1 - s^r)^b    (r rows/band, b bands)

  num_hashes=16, b=4, r=4  ->  P(0.57) ~ 36%   (the default)
  num_hashes=16, b=2, r=8  ->  P(0.57) ~ 2%    (stricter buckets)

Usage: python tools/probe_lsh_knobs.py   (prints one JSON line;
findings recorded in BENCH_NOTES.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from vectordb_data_ingestion_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
)
from vectordb_data_ingestion_spark.session import (  # noqa: E402
    get_spark,
    load_tables,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10
MUTATE_PCT = 10  # % of words suffixed per copy -> shingle-J ~ 0.57


def build_dup_heavy(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for i in range(COPIES):
        mutated = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.when(
                    F.abs(F.hash(w)) % 100 < MUTATE_PCT,
                    F.concat(w, F.lit(f"c{i}")),
                ).otherwise(w),
            ),
            " ",
        )
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_id))
            .withColumn("text", mutated)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()


def main() -> None:
    spark = get_spark(app_name="probe_lsh_knobs")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = build_dup_heavy(spark)
    n_docs = corpus.count()
    results = {}
    for bands in (4, 2):  # 16 hashes -> 4 or 8 rows per band
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(
            corpus, num_hashes=16, bands=bands, shingle_n=3,
            jaccard_threshold=0.5,
        )
        n_pairs = pairs.count()
        elapsed = round(time.perf_counter() - t0, 3)
        # candidate volume BEFORE the verify filter: rerun with threshold
        # 0 so every bucket collision survives to the count
        cand = minhash_lsh_pairs(
            corpus, num_hashes=16, bands=bands, shingle_n=3,
            jaccard_threshold=0.0,
        ).count()
        results[f"bands={bands},rows={16 // bands}"] = {
            "candidates": cand,
            "verified_pairs": n_pairs,
            "seconds": elapsed,
        }
    print(
        json.dumps(
            {
                "metric": "lsh_knob_probe",
                "corpus_docs": n_docs,
                "copies": COPIES,
                "mutate_pct": MUTATE_PCT,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
