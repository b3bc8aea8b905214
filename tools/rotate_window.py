"""Propose the next round's _DRIVER_PRIORITY window.

The driver verifies only the FIRST 50 entries of __spark_entry__.queries()
per round (CORRECTNESS_r{N}.json). With the registry frozen at 162, rounds
5+ rotate RE-verification: least-recently-verified first, so staleness is
bounded at ~3 rounds for every query.

Reads every CORRECTNESS_r*.json in the repo root, computes each query's
last-verified round, and prints the 50 least-recently-verified query names
(never-verified first, then oldest round, ties in registry order) as a
ready-to-paste Python list. Queries whose semantics changed since their
last green row should be promoted to the head manually — the git log, not
this script, knows that.

Usage: python tools/rotate_window.py [window_size] [--apply]
       --apply rewrites the _DRIVER_PRIORITY block in queries_catalog.py
       in place (manual semantics-promotions still go on top by hand).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from vectordb_data_ingestion_spark import queries_catalog  # noqa: E402


def last_verified() -> dict[str, int]:
    seen: dict[str, int] = {}
    # repo-root-relative, NOT cwd-relative: run from anywhere, a missing
    # history must not quietly look like "nothing ever verified"
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        with open(path) as fh:
            data = json.load(fh)
        rows = data if isinstance(data, dict) else {}
        for name, row in rows.items():
            # driver row shape: {rows_match, schema_match, hash_match,
            # spark_rows, oracle_rows, err} — count a query as verified
            # only when its row is GREEN; a red row should stay at the
            # head of the next window, not rotate to the back
            if isinstance(row, dict) and row.get("hash_match"):
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def render(window, seen) -> str:
    lines = ["_DRIVER_PRIORITY = ["]
    for n in window:
        lines.append(f'    "{n}",  # r{seen.get(n, "-never-")}')
    lines.append("]")
    return "\n".join(lines)


def apply_window(block: str) -> None:
    """Rewrite the _DRIVER_PRIORITY list literal in queries_catalog.py in
    place (the commentary above it is left untouched — update it by hand
    when the rationale changes)."""
    path = os.path.join(
        _REPO, "vectordb_data_ingestion_spark", "queries_catalog.py"
    )
    src = open(path).read()
    start = src.index("_DRIVER_PRIORITY = [")
    end = src.index("]", start) + 1
    open(path, "w").write(src[:start] + block + src[end:])


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--apply"]
    do_apply = "--apply" in sys.argv[1:]
    size = int(args[0]) if args else 50
    seen = last_verified()
    registry = list(queries_catalog.SPARK_QUERIES)
    ranked = sorted(
        registry, key=lambda n: (seen.get(n, -1), registry.index(n))
    )
    window = ranked[:size]
    block = render(window, seen)
    print(f"# next window ({size} of {len(registry)}; last-verified round "
          "in comments)")
    print(block)
    if do_apply:
        apply_window(block)
        print("# applied to queries_catalog.py — re-import to validate")


if __name__ == "__main__":
    main()
