"""Relational set-operation pins that the oracle hash gate alone can't
witness — chiefly NON-VACUITY: a 0-row Spark result vs a 0-row oracle
result hashes equal without testing the operator at all (VERDICT r13
gap #3)."""

from __future__ import annotations


def test_set_except_is_non_vacuous_and_matches_oracle(spark, sf_dir, duck):
    """The set_except operands must actually difference to a non-empty
    set at the smallest SF, and the surviving key multiset must match
    DuckDB's EXCEPT exactly (set semantics: no duplicates)."""
    from mapreducecf_spark.registry import QUERIES, oracles

    rows = QUERIES["set_except"](spark, sf_dir).collect()
    got = sorted(r["custkey"] for r in rows)
    assert len(got) > 0, "set_except gate is vacuous again (0 rows)"
    assert len(got) == len(set(got)), "EXCEPT must de-duplicate"
    want = sorted(r[0] for r in duck.execute(oracles()["set_except"]).fetchall())
    assert got == want


def test_set_except_all_keeps_multiplicity(spark, sf_dir, duck):
    """EXCEPT ALL is a bag difference: the result must contain
    duplicate keys (orders repeat custkeys), distinguishing it from the
    set-semantics operator above."""
    from mapreducecf_spark.registry import QUERIES, oracles

    got = sorted(r["custkey"] for r in QUERIES["set_except_all"](spark, sf_dir).collect())
    assert len(got) > len(set(got)), "bag difference lost multiplicity"
    want = sorted(r[0] for r in duck.execute(oracles()["set_except_all"]).fetchall())
    assert got == want
