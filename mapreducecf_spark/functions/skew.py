"""Skew-handling join helpers for the 100 TB design point.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions — but it only works
for sort-merge joins and only per-partition. These helpers are the
explicit salting patterns for the cases AQE can't fix:

- :func:`salted_join`: a *hot-key* equi-join where one side is small
  enough to replicate. Every big-side row picks a random-ish salt in
  ``[0, n)`` (deterministic per row — derived from a hash of the whole
  row's key + a disambiguator column, so re-runs re-plan identically);
  the small side is exploded n×. The hot key's rows spread over n
  shuffle partitions instead of one straggler.
- :func:`salted_global_agg`: two-phase aggregation for a LOW-cardinality
  group-by (e.g. global or per-country totals) where even partial
  aggregation leaves one reducer per group: first aggregate by
  (key, salt), then re-aggregate by key. The second shuffle moves only
  ``n_groups × n_salts`` rows.

Both preserve exact semantics (tests assert equality against the
unsalted plan); they only change the physical row distribution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on``, salted ``n_salts`` ways.

    ``salt_source``: a column/expression with per-row variety on the
    big side (default: the whole row's remaining first column); its
    hash spreads a hot key's rows across salts deterministically.
    """
    if salt_source is None:
        extra = [c for c in big.columns if c not in on]
        salt_source = F.col(extra[0]) if extra else F.lit(0)
    elif isinstance(salt_source, str):
        salt_source = F.col(salt_source)

    b = big.withColumn(SALT_COL, F.pmod(F.hash(*on, salt_source), F.lit(n_salts)))
    s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, [*on, SALT_COL], how)
    return out.drop(SALT_COL)


def salted_global_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 32,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation. ``aggs`` maps output column ->
    "sum:col" | "count:*" | "max:col" | "min:col" (decomposable aggs
    only — that's what makes two-phase legal)."""
    if salt_source is None:
        extra = [c for c in df.columns if c not in keys]
        salt_source = F.col(extra[0]) if extra else F.lit(0)
    elif isinstance(salt_source, str):
        salt_source = F.col(salt_source)

    phase1, phase2 = [], []
    for out_col, spec in aggs.items():
        op, _, col = spec.partition(":")
        tmp = f"__p1_{out_col}"
        if op == "count":
            phase1.append(F.count("*").alias(tmp))
            phase2.append(F.sum(tmp).alias(out_col))
        elif op in ("sum", "max", "min"):
            phase1.append(getattr(F, op)(col).alias(tmp))
            phase2.append(getattr(F, op)(tmp).alias(out_col))
        else:
            raise ValueError(f"non-decomposable agg {spec!r}")

    salted = df.withColumn(SALT_COL, F.pmod(F.hash(salt_source), F.lit(n_salts)))
    p1 = salted.groupBy(*keys, SALT_COL).agg(*phase1)
    return p1.groupBy(*keys).agg(*phase2)
