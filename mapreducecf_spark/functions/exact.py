"""Engine-exact aggregation helpers.

Floating-point SUM is order-dependent, and Spark's shuffle order is
nondeterministic — so a raw ``sum(double)`` can differ between two Spark
runs, let alone between Spark and an oracle engine. Any aggregate that
feeds a correctness check (or any user who wants run-to-run stable
results) should aggregate in DECIMAL: per-row arithmetic stays in
IEEE-754 double (bitwise identical on every engine), the row value is
then cast to a fixed-scale decimal, and the SUM is exact integer
arithmetic — associative, order-independent, overflow-checked.

At 100 TB this is also the *correct* choice, not just the reproducible
one: summing 10^11 doubles loses ~5 significant digits to accumulated
rounding; decimal sums lose none.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast a (double) column/expression to a fixed-scale decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact sum: cast to decimal, sum exactly, then
    return DOUBLE.

    The *accumulation* is exact integer-decimal arithmetic (associative,
    order-independent); the *result type* is double because the engine's
    contract is to never ship DecimalType in a final schema — different
    consumers (and the driver's value-hash gate) render decimals
    differently, while the exact-decimal-total → nearest-double
    conversion is identical in every IEEE-754 engine. Oracle twin:
    ``CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``.

    Use on RAW stored columns. For COMPUTED double expressions use
    :func:`csum` — engines disagree on double→decimal rounding when the
    value lands within an ulp of a half-cent (Spark rounds the exact
    binary expansion, DuckDB rounds ``x*100`` computed in double).
    """
    return F.sum(dec(col, scale)).cast("double")


def dsum_dec(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum WITHOUT the final double cast — for
    intermediate arithmetic only (e.g. under a window, before a
    ratio). Never alias this directly into a final schema."""
    return F.sum(dec(col, scale))


def csum(expr: Column, scale: int = 2) -> Column:
    """Exact, engine-portable sum of a computed double expression.

    ``round(expr * 10^scale)`` is evaluated identically by any IEEE-754
    engine (identical input bits → identical product → same
    nearest/half-away rounding), so the per-row integer "cents" are
    portable; their BIGINT sum is exact and order-independent; the final
    divide-back is a single double op on identical inputs. Result is
    DOUBLE with full round-trip fidelity.
    """
    unit = 10**scale
    cents = F.round(expr * unit).cast("bigint")
    return F.sum(cents).cast("double") / unit


def csum_sql(expr_sql: str, alias: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`csum` for oracle strings."""
    unit = 10**scale
    return (
        f"CAST(sum(CAST(round(({expr_sql}) * {unit}) AS BIGINT)) AS DOUBLE)"
        f" / {unit} AS {alias}"
    )
