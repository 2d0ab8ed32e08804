"""Canary-bracketed bench comparison.

Raw per-query deltas between two bench runs conflate the query's own
regression with the container's state (CPU contention, scheduler
latency, Arrow/py4j throughput, page-cache/IO state). Each bench run
records canaries that isolate those axes:

- ``canary_sec``        — fixed CPU-bound aggregation (whole-stage codegen)
- ``canary_jobs_sec``   — N tiny jobs back-to-back (scheduler round-trips)
- ``canary_arrow_sec``  — fixed 2M-row mapInPandas round-trip (Arrow axis)
- ``canary_scan_sec``   — parquet scan + one shuffle on real testdata
  (the scan/shuffle-IO axis the synthetic canaries miss; round-7 late)

A query is flagged as a REAL regression only when its time grew > the
threshold under ALL THREE normalizations (new_time / (new_canary /
old_canary) vs old_time) — if even one axis explains the growth, the
round-over-round drift is container noise on that axis, not a
formulation change.

Usage::

    python scripts/bench_compare.py OLD.json NEW.json [--threshold 0.05]

Exit code 0 always (reporting tool); prints a markdown block for
DESIGN.md.
"""

from __future__ import annotations

import json
import sys

CANARIES = (
    "canary_sec",
    "canary_jobs_sec",
    "canary_arrow_sec",
    "canary_scan_sec",  # absent in artifacts before round 7 late; skipped
)


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def compare(old: dict, new: dict, threshold: float = 0.05):
    """Return (flagged, improved, common_totals) where flagged is
    [(name, raw_ratio, bracketed_ratios)] for queries whose bracketed
    growth exceeds the threshold under every canary axis."""
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    scales = {}
    for c in CANARIES:
        if old.get(c) and new.get(c):
            scales[c] = new[c] / old[c]
    flagged, improved = [], []
    for name in common:
        raw = nq[name] / oq[name]
        bracketed = {c: raw / s for c, s in scales.items()}
        if bracketed and all(b > 1 + threshold for b in bracketed.values()):
            flagged.append((name, raw, bracketed))
        elif bracketed and all(b < 1 - threshold for b in bracketed.values()):
            improved.append((name, raw, bracketed))
    totals = (
        sum(oq[n] for n in common),
        sum(nq[n] for n in common),
    )
    return flagged, improved, totals, scales, common


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 0.05
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    flagged, improved, totals, scales, common = compare(old, new, threshold)
    print(f"common queries: {len(common)}")
    print(
        "canary scale (new/old): "
        + ", ".join(f"{c}={s:.3f}" for c, s in scales.items())
    )
    print(
        f"common-subset total: {totals[0]:.1f}s -> {totals[1]:.1f}s "
        f"(raw {totals[1] / totals[0]:.2f}x)"
    )
    if flagged:
        print(f"\nREGRESSIONS (> {threshold:.0%} under ALL canary axes):")
        for name, raw, br in sorted(flagged, key=lambda x: -x[1]):
            axes = ", ".join(f"{c.split('_')[1]}={v:.2f}x" for c, v in br.items())
            print(f"  {name}: raw {raw:.2f}x ({axes})")
    else:
        print(f"\nno query regressed > {threshold:.0%} under all three axes")
    if improved:
        print(f"\nimprovements (> {threshold:.0%} under all axes):")
        for name, raw, br in sorted(improved, key=lambda x: x[1]):
            print(f"  {name}: raw {raw:.2f}x")


if __name__ == "__main__":
    main()
