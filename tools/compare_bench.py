"""Per-query diff of two bench records — the adjudication input for
the README's >0.5 s-rise ⇒ retime rule.

Accepts any mix of:
- a full ``bench.py`` output file / committed ``BENCH.json`` (has a
  top-level ``queries`` dict),
- a driver ``BENCH_r{N}.json`` (summary under ``parsed`` plus a
  TRUNCATED ``tail`` string — the queries dict is recovered from the
  tail when it survived truncation; otherwise the file is rejected
  with a message rather than silently compared on nothing).

Usage::

    python tools/compare_bench.py OLD.json NEW.json [--rise 0.5]

Prints rises above the threshold (the rows the rule says to retime),
the largest drops, and the shared-name totals. Exit code 1 if any
rise exceeds the threshold, so a round-end script can gate on it.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        return d["queries"]
    # bench.py stdout capture: last full JSON line wins
    if isinstance(d, dict) and "tail" in d:
        t = d["tail"]
        i = t.find('"queries":{')
        if i >= 0:
            frag = t[i + len('"queries":') :]
            depth, end = 0, -1
            for j, ch in enumerate(frag):
                if ch == "{":
                    depth += 1
                elif ch == "}":
                    depth -= 1
                    if depth == 0:
                        end = j + 1
                        break
            if end > 0:
                try:
                    return json.loads(frag[:end])
                except json.JSONDecodeError:
                    pass
        raise SystemExit(
            f"{path}: driver record's tail is truncated mid-queries — "
            "compare against the committed BENCH.json instead"
        )
    raise SystemExit(f"{path}: no queries dict found")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--rise", type=float, default=0.5)
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    shared = sorted(set(old) & set(new))
    rises = [(n, old[n], new[n]) for n in shared if new[n] - old[n] > args.rise]
    drops = [(n, old[n], new[n]) for n in shared if old[n] - new[n] > args.rise]
    rises.sort(key=lambda t: t[1] - t[2])
    drops.sort(key=lambda t: t[2] - t[1])
    print(f"shared names: {len(shared)}  "
          f"(only-old: {len(set(old) - set(new))}, "
          f"only-new: {len(set(new) - set(old))})")
    print(f"totals on shared names: {sum(old[n] for n in shared):.1f} -> "
          f"{sum(new[n] for n in shared):.1f} s")
    print(f"\nrises > {args.rise}s ({len(rises)}) — retime each "
          "(tools/retime.py) and record the adjudication:")
    for n, a, b in rises:
        print(f"  {n:40s} {a:6.2f} -> {b:6.2f}  (+{b - a:.2f})")
    print(f"\ndrops > {args.rise}s ({len(drops)}):")
    for n, a, b in drops[:15]:
        print(f"  {n:40s} {a:6.2f} -> {b:6.2f}  (-{a - b:.2f})")
    return 1 if rises else 0


if __name__ == "__main__":
    sys.exit(main())
