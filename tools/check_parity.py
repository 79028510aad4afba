"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the given SF, compare row count, sorted-column schema, and an
order-insensitive value hash. Usage::

    python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducecf_spark.sources import TABLES  # noqa: E402


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, stringify values, sort rows.

    Decimal cells are round-tripped through float so both engines'
    decimal renderings collapse to the same string — but see the
    DecimalType guard in main(): shipping DecimalType in a final schema
    is DISALLOWED (the driver's own normalizer renders Spark vs DuckDB
    decimals differently, failing hash_match even when values agree), so
    this tool reports any decimal output column as a failure.
    """
    import decimal

    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v: object) -> str:
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
        if isinstance(v, float):
            return repr(v)  # shortest round-trip: bitwise-strict compare
        if isinstance(v, bool):
            return str(v).lower()
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    h = hashlib.sha256()
    for r in normalize(rows, cols):
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from mapreducecf_spark import get_spark

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        # Final-schema type rule (registry.py conventions): scalars only.
        # DecimalType renders engine-differently under the driver's
        # normalizer; ARRAY/MAP/STRUCT cells are unhashable in its pandas
        # canonicalizer (CORRECTNESS_r02: agg_array_collect crash).
        bad_cols = [
            f"{f.name}:{f.dataType.typeName()}"
            for f in sdf.schema.fields
            if f.dataType.typeName().startswith("decimal")
            or f.dataType.typeName() in ("array", "map", "struct")
        ]
        if bad_cols:
            print(
                f"FAIL  {name}: non-scalar/decimal in final schema {bad_cols} — "
                "disallowed (see registry.py conventions); emit scalar "
                "columns (array_join / cast to double)"
            )
            failures += 1
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only check, {len(srows)} rows ({took:.1f}s)")
            continue
        try:
            # DESCRIBE the oracle first: DuckDB-side type rule. HUGEINT
            # (bare integer sum()) and DECIMAL stringify differently from
            # Spark's BIGINT/DOUBLE in the driver; lists/structs crash it.
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            bad_duck = [
                f"{cname}:{ctype}"
                for cname, ctype, *_ in desc
                if "HUGEINT" in ctype.upper()
                or ctype.upper().startswith("DECIMAL")
                or "[]" in ctype
                or ctype.upper().startswith(("STRUCT", "MAP", "UNION"))
            ]
            if bad_duck:
                print(
                    f"FAIL  {name}: oracle emits non-portable types {bad_duck} — "
                    "CAST integer sums AS BIGINT / decimals AS DOUBLE, "
                    "join lists to strings"
                )
                failures += 1
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {ex}")
            failures += 1
            continue
        # Driver-canonicalization dry run: the driver sorts a pandas
        # DataFrame by every column (lexsort via Categorical) — replicate
        # it so anything its _canon would crash on fails HERE, not in
        # CORRECTNESS_r{N}.json.
        try:
            import pandas as pd

            for cols_, rows_ in ((scols, srows), (dcols, drows)):
                pdf = pd.DataFrame(rows_, columns=list(cols_))
                pdf = pdf.reindex(sorted(pdf.columns), axis=1)
                if len(pdf):
                    pdf.sort_values(by=list(pdf.columns))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: driver canonicalization would crash: {ex}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} != {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} != {sorted(dcols)}")
        if not problems and value_hash(srows, scols) != value_hash(drows, dcols):
            problems.append("value hash mismatch")
            sn, dn = normalize(srows, scols), normalize(drows, dcols)
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            for a, b in diffs:
                problems.append(f"  spark={a} duck={b}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows ({took:.1f}s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
