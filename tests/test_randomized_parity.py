"""Seeded randomized parity: hundreds of generated cases per operator,
checked against an independent reference implementation in ONE Spark job
(per-example Spark roundtrips would be prohibitively slow).
"""

import random
import re
from datetime import datetime, timedelta

import pandas as pd

from vectordb_data_ingestion_spark.functions.chunking import chunk_fixed_size_overlap
from vectordb_data_ingestion_spark.operators.asof import asof_join

ALPHABET = ["alpha", "beta", "g", "dd", "ee5", "x,y", "ω", " ", "\t", "\n", "7"]


def _ref_chunks(text, chunk_size, overlap_fraction):
    words = re.split(r"\s", re.sub(r"\s+", " ", text))
    ov = int(chunk_size * overlap_fraction)
    return [
        " ".join(words[max(i - ov, 0): i + chunk_size])
        for i in range(0, len(words), chunk_size)
    ]


def test_chunker_randomized_parity(spark):
    rng = random.Random(0)
    texts = [
        "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(0, 120)))
        for _ in range(200)
    ]
    for cs, ovf in [(5, 0.2), (3, 0.5), (7, 0.99)]:
        df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
        got = {}
        for r in chunk_fixed_size_overlap(df, "text", cs, ovf).collect():
            got.setdefault(r["doc_id"], {})[r["chunk_index"]] = r["chunk_text"]
        for i, t in enumerate(texts):
            chunks = [got[i][j] for j in sorted(got[i])]
            assert chunks == _ref_chunks(t, cs, ovf), (repr(t), cs, ovf)


def test_asof_randomized_parity_vs_pandas(spark):
    """asof_join vs pandas.merge_asof(direction='backward') on 2k random
    rows across 40 keys - same matches, including tie and no-match cases."""
    rng = random.Random(1)
    base = datetime(2024, 1, 1)

    def rows(n, keys):
        return [
            (i, rng.randrange(keys), base + timedelta(seconds=rng.randrange(0, 3600)))
            for i in range(n)
        ]

    left_rows = rows(1000, 40)
    right_raw = rows(1000, 40)
    # right must be unique per (key, ts): keep max id per slot (the operator's
    # documented precondition)
    right_map = {}
    for i, k, ts in right_raw:
        right_map[(k, ts)] = max(right_map.get((k, ts), -1), i)
    right_rows = [(k, ts, float(i)) for (k, ts), i in right_map.items()]

    left = spark.createDataFrame(left_rows, "id long, k long, ts timestamp")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, v double")
    got = {
        r["id"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(left, right, key_cols=["k"]).collect()
    }

    lpd = pd.DataFrame(left_rows, columns=["id", "k", "ts"]).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts", kind="stable")
    merged = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward", suffixes=("", "_r"))
    for _, row in merged.iterrows():
        want_v = None if pd.isna(row["v"]) else row["v"]
        got_ts, got_v = got[row["id"]]
        assert got_v == want_v, (row["id"], got_v, want_v)
        if want_v is not None:
            # matched timestamp must be the right row holding that value
            assert (row["k"], got_ts) in {(k, ts) for k, ts, _ in right_rows}
