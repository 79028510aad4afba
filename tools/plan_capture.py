"""Capture ``explain("formatted")`` for named queries into
``plans/r18/<query>_<tag>.txt`` — the optimization round's before/after
plan evidence. Usage::

    python tools/plan_capture.py <tag> [sf_dir] query [query ...]

``tag`` is ``before`` or ``after``. Construction-side eager work (memo
builds, localCheckpoints) runs as usual; the captured artifact is the
final plan the noop sink would execute.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    if len(args) < 2:
        print(__doc__)
        return 2
    tag = args[0]
    args = args[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from mapreducecf_spark import get_spark
    from mapreducecf_spark.registry import QUERIES

    unknown = [q for q in args if q not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r19"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="mapreducecf-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} [{tag}]\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
