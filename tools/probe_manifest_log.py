"""Commit-cost envelope: monolithic CAS manifest vs chunked commit log
(VERDICT r8 item 2).

The monolithic protocol's per-commit cost is the full manifest payload
(segment list + per-file lists for partially-dereferenced segments)
through one conditional put; the chunked log appends an O(mutation)
delta record instead. This probe drives the STORE protocol directly (no
Spark — the boundary is control-plane bytes and round trips, not data
work): seed a manifest with S segments (a fraction partially
dereferenced, carrying per-file lists), then time K single-entry-append
commits through each substrate over the same FileConditionalStore,
recording store bytes written per commit and end-to-end commit latency.

Run: python tools/probe_manifest_log.py [out.json]

What the numbers mean at 100 TB: on a real object store the commit path
is network round trips x payload bytes; the file binding underestimates
the byte cost (local disk), so the BYTES column is the scale-honest
metric and the latency column is a lower bound on the win. CPU stays
O(manifest) per commit on both substrates (the sink parses the full
manifest JSON through the store seam) — that is driver-side CPU, not
serialized store traffic.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from vectordb_data_ingestion_spark.sinks.commit_store import (  # noqa: E402
    FileConditionalStore,
)
from vectordb_data_ingestion_spark.sinks.log_store import (  # noqa: E402
    LogConditionalStore,
)


class ByteMeter:
    """Wraps a ConditionalStore, tallying bytes offered per put_if."""

    def __init__(self, inner):
        self.inner = inner
        self.bytes = 0
        self.puts = 0

    def get(self, key):
        return self.inner.get(key)

    def put_if(self, key, data, token):
        self.bytes += len(data)
        self.puts += 1
        return self.inner.put_if(key, data, token)

    def delete_if(self, key, token):
        return self.inner.delete_if(key, token)


def seed_manifest(n_segments: int, partial_frac: float, files_per: int):
    segs = []
    for i in range(n_segments):
        d = uuid.uuid4().hex
        if i % max(1, int(1 / partial_frac)) == 0:
            segs.append(
                {
                    "dir": d,
                    "files": [
                        f"pbucket={j % 8}/part-{j:05d}.parquet"
                        for j in range(files_per)
                    ],
                }
            )
        else:
            segs.append({"dir": d, "full": True})
    return {
        "layout": {"partition_col": None, "key_col": "chunk_id",
                   "n_buckets": 8},
        "segments": segs,
        "commit_id": 1,
        "schema": json.dumps({"type": "struct", "fields": []}),
    }


def drive(store, meter: ByteMeter, manifest: dict, n_commits: int,
          parsed: bool = False) -> dict:
    """Seed, then time K append-one-entry commits (the upsert shape) via
    the exact get-modify-put loop the sink runs. ``meter`` wraps the
    store that actually persists bytes (for the log substrate, the INNER
    store: what crosses the wire is records + periodic checkpoints, not
    the logical payload the sink hands over); the seed commit is
    excluded from the average. ``parsed=True`` mirrors the sink's r10
    parsed-handle loop (get_state/put_state_if, copy-on-write manifest
    build, zero full-state JSON outside checkpoint boundaries)."""
    assert store.put_if("MANIFEST", json.dumps(manifest).encode(), None)
    lat = []
    base_bytes = meter.bytes
    for _ in range(n_commits):
        t0 = time.perf_counter()
        if parsed:
            cur = store.get_state("MANIFEST")
            m = cur[0]  # shared with the store cache — never mutated
            m2 = {
                **m,
                "segments": m["segments"]
                + [{"dir": uuid.uuid4().hex, "full": True}],
                "commit_id": int(m["commit_id"]) + 1,
            }
            assert store.put_state_if("MANIFEST", m2, cur[1])
            store.put_state_if(f"MANIFEST.v{m2['commit_id']}", m2, None)
        else:
            cur = store.get("MANIFEST")
            m = json.loads(cur[0].decode("utf-8"))
            m["segments"].append({"dir": uuid.uuid4().hex, "full": True})
            m["commit_id"] = int(m["commit_id"]) + 1
            assert store.put_if("MANIFEST", json.dumps(m).encode(), cur[1])
            # history publication, as _commit does (monolithic: one more
            # full-payload put; log: a no-op — the record IS the history)
            store.put_if(
                f"MANIFEST.v{m['commit_id']}", json.dumps(m).encode(), None
            )
        lat.append(time.perf_counter() - t0)
    lat.sort()
    return {
        "commits": n_commits,
        "p50_ms": round(lat[len(lat) // 2] * 1e3, 2),
        "p95_ms": round(lat[int(len(lat) * 0.95)] * 1e3, 2),
        "store_bytes_per_commit": int(
            (meter.bytes - base_bytes) / n_commits
        ),
    }


def main() -> None:
    # optional: SEGMENTS=100000 COMMITS=8 to push a single decade; the
    # default sweep covers 100/1k/10k at 40 commits
    seg_env = os.environ.get("SEGMENTS")
    sweep = (
        [int(seg_env)] if seg_env else [100, 1_000, 10_000]
    )
    n_commits = int(os.environ.get("COMMITS", "40"))
    results = []
    substrates = tuple(
        os.environ.get("SUBSTRATES", "mono,log,log-parsed").split(",")
    )
    for n_segments in sweep:
        for substrate in substrates:
            root = tempfile.mkdtemp(prefix=f"mlog_{substrate}_{n_segments}_")
            meter = ByteMeter(FileConditionalStore(root))
            store = (
                meter
                if substrate == "mono"
                else LogConditionalStore(meter, checkpoint_every=32)
            )
            manifest = seed_manifest(
                n_segments, partial_frac=0.25, files_per=64
            )
            rec = drive(store, meter, manifest, n_commits=n_commits,
                        parsed=substrate == "log-parsed")
            rec.update({"substrate": substrate, "segments": n_segments})
            results.append(rec)
            print(json.dumps(rec), flush=True)
    out = {"probe": "manifest_log_commit_cost", "results": results}
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
