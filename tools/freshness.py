"""Driver-row freshness auditor: the rotation's bookkeeping, checkable.

The driver grades a hard window of 50 queries per round
(``CORRECTNESS_r{N}.json``); everything else keeps its last row. The
only blind spot of an otherwise fully green gate is therefore ROW AGE —
a query whose code changed after its last driver row is green-by-
staleness, not green-by-witness. This tool prints, from the union of
all correctness files:

- per-round counts of latest rows (the age histogram),
- any query whose LATEST row is not fully green,
- registered queries with NO driver row yet (should be empty outside
  the round a query is added in),
- the stalest cohort, cheapest-first by its last bench time — i.e.
  exactly the tail `_GRADE_FIRST` (registry.py) should carry next
  round.

Usage::

    python tools/freshness.py [--cohort N]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_rows() -> dict[str, tuple[int, dict]]:
    """query -> (round of latest driver row, that row)."""
    latest: dict[str, tuple[int, dict]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        d = json.load(open(f))
        for k, v in d.items():
            if isinstance(v, dict):
                latest[k] = (rnd, v)
    return latest


def bench_times() -> dict[str, float]:
    """query -> last per-query bench seconds (for cheapest-first)."""
    path = os.path.join(REPO, "BENCH.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            if isinstance(d.get("queries"), dict):
                return d["queries"]
    return {}


def green(row: dict) -> bool:
    return bool(
        row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
    )


def main() -> int:
    cohort_n = 50
    if "--cohort" in sys.argv:
        cohort_n = int(sys.argv[sys.argv.index("--cohort") + 1])

    from mapreducecf_spark.registry import QUERIES

    latest = latest_rows()
    times = bench_times()

    by_round: dict[int, int] = {}
    for rnd, _ in latest.values():
        by_round[rnd] = by_round.get(rnd, 0) + 1
    print("latest-row age histogram (round -> queries):")
    for rnd in sorted(by_round):
        print(f"  r{rnd:02d}: {by_round[rnd]}")

    failing = [k for k, (_, v) in latest.items() if not green(v)]
    print(f"latest-row NOT green: {failing or 'none'}")

    never = sorted(set(QUERIES) - set(latest))
    print(f"registered but never driver-graded: {never or 'none'}")

    if not latest:
        print("no CORRECTNESS_r*.json rows found — nothing to age")
        return 0
    # N stalest ACROSS rounds (round ASC, then cheapest-first within a
    # round) — the tail _GRADE_FIRST should carry may span rounds, e.g.
    # r09's 39-row carry was 12 r03 + 27 r04
    stale = sorted(latest.items(), key=lambda kv: (kv[1][0], times.get(kv[0], 9e9)))
    cohort = stale[:cohort_n]
    print(f"stalest cohort (round ASC then cheapest-first, cap {cohort_n}):")
    for k, (rnd, _) in cohort:
        print(f"  r{rnd:02d}  {times.get(k, float('nan')):6.2f}s  {k}")
    return 1 if failing else 0


if __name__ == "__main__":
    sys.exit(main())
