"""One-time vendoring step: train the packaged BPE merge table.

Closes the tiktoken waiver (COVERAGE.md §2.3) without tiktoken: the
reference counts tokens with the proprietary-licensed cl100k_base merges
table (sharepointutils.py:364), which cannot be vendored. Instead we train
a small merge table with the engine's OWN deterministic trainer
(operators/bpe.py::bpe_train — ties break lexicographically, so the same
corpus yields the same vocabulary on any engine or cluster size) on the
driver-generated sf0.001 documents corpus, and ship it inside the package
as `functions/bpe_merges_v1.json`. Everything involved is this repo's own
code and synthetic data — no third-party license attaches.

Usage: python tools/train_vendored_bpe.py [num_merges]
Rerunning regenerates an identical file (determinism is the point);
bump the version suffix if the training corpus or merge count changes,
so deployed counts never silently shift.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from vectordb_data_ingestion_spark.operators.bpe import bpe_train  # noqa: E402
from vectordb_data_ingestion_spark.session import get_spark  # noqa: E402

CORPUS = "/root/testdata/sf0.001/documents.parquet"
OUT = os.path.join(
    _REPO, "vectordb_data_ingestion_spark", "functions", "bpe_merges_v1.json"
)


def main() -> None:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spark = get_spark(app_name="train_vendored_bpe")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(CORPUS).select("text")
    merges = bpe_train(corpus, num_merges=num_merges)
    payload = {
        "version": 1,
        "trainer": "operators/bpe.py::bpe_train (deterministic)",
        "corpus": "driver-generated synthetic sf0.001 documents",
        "num_merges": len(merges),
        "end_token": "</w>",
        "merges": [[l, r] for l, r, _count in merges],
    }
    with open(OUT, "w") as fh:
        json.dump(payload, fh, ensure_ascii=False, indent=0)
        fh.write("\n")
    print(f"wrote {OUT} ({len(merges)} merges)")


if __name__ == "__main__":
    main()
