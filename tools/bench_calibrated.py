"""Calibrated round-over-round bench comparison (VERDICT r9 item 4).

This host's wall-clock varies ±15% run-to-run with neighbor load, so raw
per-query ratios between rounds conflate code changes with host speed.
Since r9, ``bench.py`` records a host block with a fixed calibration job
(range→bit_xor(xxhash64), median of 3). Dividing every per-query ratio
by the calibration ratio cancels the host term, making the comparison
self-adjudicating: a calibrated ratio > ``FLAG_AT`` (default 1.3) on a
non-noisy query is a real regression to investigate, not weather.

Usage: python tools/bench_calibrated.py OLD.json NEW.json [flag_at]
       (full per-query records, i.e. BENCH_LOCAL.json snapshots)
Prints a markdown table of the largest calibrated movers and a JSON
summary line; exits 1 if any non-noisy query is flagged.
"""

from __future__ import annotations

import json
import sys

FLAG_AT = 1.3


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    flag_at = float(sys.argv[3]) if len(sys.argv) > 3 else FLAG_AT
    old = json.load(open(old_path))
    new = json.load(open(new_path))

    def anchor(rec: dict) -> float:
        # mean of the start and end calibrations: the host is not
        # stationary across a ~15-min run (r10 run 1: 0.634 s at start
        # vs 0.465 s at end within one process), and queries sample the
        # whole window — a single anchor systematically mis-adjudicates
        # whichever half it didn't measure
        h = rec["host"]
        return (h["calibration_median_s"] + h["calibration_end_s"]) / 2

    cal_old = anchor(old)
    cal_new = anchor(new)
    cal_ratio = cal_new / cal_old

    def shuffle_anchor(rec: dict) -> float | None:
        h = rec["host"]
        if "calibration_shuffle_s" not in h:
            return None
        return (
            h["calibration_shuffle_s"]
            + h.get("calibration_shuffle_end_s", h["calibration_shuffle_s"])
        ) / 2

    # the data-plane anchor (present from r10): when BOTH records carry
    # it, its ratio diagnoses bandwidth/shuffle contention the CPU
    # anchor misses — reported, not used for division, so the primary
    # adjudication stays comparable across rounds
    sh_old, sh_new = shuffle_anchor(old), shuffle_anchor(new)
    shuffle_ratio = (
        round(sh_new / sh_old, 3) if sh_old and sh_new else None
    )
    noisy = set(old.get("noisy_queries", [])) | set(
        new.get("noisy_queries", [])
    )
    rows = []
    for q, t_new in new["queries"].items():
        t_old = old["queries"].get(q)
        if not t_old or t_old < 0.05:  # sub-50ms: pure scheduling noise
            continue
        raw = t_new / t_old
        rows.append(
            {
                "query": q,
                "old_s": round(t_old, 3),
                "new_s": round(t_new, 3),
                "raw_ratio": round(raw, 2),
                "calibrated": round(raw / cal_ratio, 2),
                "noisy": q in noisy,
            }
        )
    rows.sort(key=lambda r: -r["calibrated"])
    flagged = [
        r for r in rows if r["calibrated"] > flag_at and not r["noisy"]
    ]
    print(
        f"calibration: {cal_old:.3f}s -> {cal_new:.3f}s "
        f"(host ratio {cal_ratio:.2f}x; per-query ratios divided by this)"
    )
    print()
    print("| query | old s | new s | raw | calibrated | noisy |")
    print("|---|---|---|---|---|---|")
    for r in rows[:12]:
        print(
            f"| {r['query']} | {r['old_s']} | {r['new_s']} | "
            f"{r['raw_ratio']} | {r['calibrated']} | "
            f"{'y' if r['noisy'] else ''} |"
        )
    print()
    summary = {
        "probe": "bench_calibrated",
        "cal_ratio": round(cal_ratio, 3),
        "shuffle_cal_ratio": shuffle_ratio,
        "compared": len(rows),
        "flag_at": flag_at,
        "flagged": [r["query"] for r in flagged],
        "stable_total_old": old.get("stable_total"),
        "stable_total_new": new.get("stable_total"),
        "stable_total_calibrated_ratio": round(
            (new.get("stable_total", 0) / old.get("stable_total", 1))
            / cal_ratio,
            3,
        ),
    }
    print(json.dumps(summary))
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
