"""Drop-in command-line surface for reference users.

The reference is driven as ``python3 server.py --input_folder F
--n_map N --n_reduce M [--case_sensitive]`` plus K ``client.py``
workers (``server.py:204-214``, ``README.md:17-27``). This CLI accepts
the SAME flags/env vars and runs the same query on Spark::

    python -m mapreducecf_spark.cli --input_folder inputs --n_reduce 4

Flag mapping (G1, SURVEY.md §2):

- ``--input_folder`` → ``*.txt`` directory scan (S1/S3).
- ``--n_map`` / ``N_MAP``: accepted for compatibility, ignored — map
  parallelism is input-split planning, which Spark derives from file
  sizes (S2 is engine-owned; ``spark.sql.files.maxPartitionBytes``).
- ``--n_reduce`` / ``N_REDUCE`` → number of output files (the
  reference emits one ``out-m`` per reduce task).
- ``--case_sensitive`` / ``CASE_SENSITIVE`` → A1 fold mode.
- ``--output_folder`` (new; reference hard-codes ``out/`` next to the
  inputs, ``server.py:139``) → sink directory, overwritten like K2.

No worker processes to launch: parallelism is in-engine.
"""

from __future__ import annotations

import argparse
import os


def _env_flag(name: str) -> bool:
    return os.environ.get(name, "").lower() in ("1", "true", "yes")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MapReduceCF-compatible word count on Spark")
    p.add_argument("--input_folder", default="inputs")
    p.add_argument("--n_map", type=int, default=int(os.environ.get("N_MAP", 6)),
                   help="accepted for reference compatibility; ignored (Spark plans input splits)")
    p.add_argument("--n_reduce", type=int, default=int(os.environ.get("N_REDUCE", 4)),
                   help="number of output files (one per reduce partition, like out-m)")
    p.add_argument("--case_sensitive", action="store_true",
                   default=_env_flag("CASE_SENSITIVE"))
    p.add_argument("--output_folder", default=None,
                   help="default: <input_folder>/out, mirroring the reference layout")
    return p


def run(argv: list[str] | None = None) -> str:
    """Execute the word count; returns the output directory path."""
    args = build_parser().parse_args(argv)
    out = args.output_folder or os.path.join(args.input_folder, "out")

    from mapreducecf_spark import get_spark
    from mapreducecf_spark.operators.wordcount import word_count, write_counts
    from mapreducecf_spark.sources import read_text_dir

    spark = get_spark(app_name="mapreducecf-cli", shuffle_partitions=args.n_reduce)
    counts = word_count(
        read_text_dir(spark, args.input_folder), case_sensitive=args.case_sensitive
    )
    # exactly n_reduce output files like the reference's out-m layout
    # (repartition, not coalesce: AQE may have coalesced the agg below
    # n_reduce, and coalesce can only shrink); the extra exchange moves
    # only the aggregated rows
    write_counts(counts.repartition(args.n_reduce), out)
    return out


if __name__ == "__main__":
    print(run())
