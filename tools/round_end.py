"""One-command end-of-round checklist — the discipline, executable.

Runs, SEQUENTIALLY (each step wants the machine to itself):

1. ``git status`` — warns on uncommitted work (a truncated round must
   never leave code halves uncommitted; VERDICT r10 item 10);
2. full ``pytest tests/ -q`` — the suite must be green at round end;
3. full parity sweep at sf0.01 (the driver-gate replica);
4. ``bench.py`` refresh with the previous committed BENCH.json saved
   aside, then ``compare_bench.py`` — every >0.5 s rise printed for
   the retime/adjudication rule;
5. ``freshness.py`` — the age histogram the next round's
   ``_GRADE_FIRST`` head is planned from.

The 1× vs 10× scale smoke is NOT included (20+ min; run
``tools/scale_smoke.py`` deliberately when plans changed). Exit code
is non-zero if pytest or parity fail, or any bench rise needs
adjudicating — so "round_end passed" means the repo is shippable.

Usage::

    python tools/round_end.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], **kw) -> subprocess.CompletedProcess:
    print(f"\n=== {name}: {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, cwd=ROOT, **kw)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--bench-sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--round",
        type=int,
        default=None,
        help="round number N: snapshot the refreshed full BENCH.json "
        "(per-query + shared_build lines) to BENCH_r{N}_full.json, so "
        "cross-round per-query regression diffs never need git "
        "archaeology (VERDICT r13 item 8 — the driver's own "
        "BENCH_r{N}.json carries only the parsed total + a truncated "
        "stdout tail)",
    )
    args = ap.parse_args()
    failures: list[str] = []

    st = run(
        "git status", ["git", "status", "--short"],
        capture_output=True, text=True,
    )
    if st.stdout.strip():
        print(st.stdout)
        print("WARNING: uncommitted work — commit code+tests+docs TOGETHER "
              "before the round ends (VERDICT r10 item 10)")

    if run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]).returncode:
        failures.append("pytest")

    par = run(
        "parity sweep",
        [sys.executable, "tools/check_parity.py", args.sf_dir],
        capture_output=True, text=True,
    )
    bad = [l for l in par.stdout.splitlines() if l and not l.startswith("PASS")]
    npass = sum(1 for l in par.stdout.splitlines() if l.startswith("PASS"))
    print(f"parity: {npass} PASS, {len(bad)} non-PASS")
    if bad:
        print("\n".join(bad[:10]))
        failures.append("parity")

    prev = os.path.join(ROOT, "BENCH.json")
    saved = "/tmp/BENCH_round_end_prev.json"
    have_prev = os.path.exists(prev)
    if have_prev:
        shutil.copy(prev, saved)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.bench_sf_dir)
    if run("bench", [sys.executable, "bench.py"], env=env,
           stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL).returncode:
        failures.append("bench")
    elif have_prev:
        if run(
            "compare vs previous BENCH.json",
            [sys.executable, "tools/compare_bench.py", saved, prev],
        ).returncode:
            failures.append("bench rises need adjudication (README retime line)")
    if args.round is not None and os.path.exists(prev):
        snap = os.path.join(ROOT, f"BENCH_r{args.round}_full.json")
        shutil.copy(prev, snap)
        print(f"snapshotted full BENCH.json -> {os.path.basename(snap)}")

    run("freshness", [sys.executable, "tools/freshness.py"])

    print("\n=== round_end:", "FAIL: " + "; ".join(failures) if failures else "PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
