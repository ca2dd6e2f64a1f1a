"""Data-quality expectations (operators/expectations.py): violation
detection, NULL semantics, and the one-scan compilation contract."""

from __future__ import annotations

import pytest

from conversation_with_vector_db_spark.operators.expectations import (
    expectation_report,
    referential_check,
)


def _report(df, specs):
    return {
        (r["check"], r["column"]): (r["observed"], r["passed"])
        for r in expectation_report(df, specs).collect()
    }


def test_violations_detected(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (1, "X", -5.0),     # dup key, bad status, below min
            (None, "F", 20.0),  # null key
        ],
        "k: long, status: string, price: double",
    )
    got = _report(
        df,
        [
            ("not_null", "k"),
            ("unique", "k"),
            ("values_in", "status", ("O", "F", "P")),
            ("min_at_least", "price", 0.0),
            ("max_at_most", "price", 15.0),
            ("row_count_between", 1, 2),
        ],
    )
    assert got[("not_null", "k")] == (1.0, False)
    # 3 rows, 1 distinct non-null value -> observed 2, fails (the
    # NULL row counts against uniqueness; not_null owns the detail).
    assert got[("unique", "k")] == (2.0, False)
    assert got[("values_in", "status")] == (1.0, False)
    assert got[("min_at_least", "price")] == (-5.0, False)
    assert got[("max_at_most", "price")] == (20.0, False)
    assert got[("row_count_between", "*")] == (3.0, False)


def test_clean_table_passes(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", 20.0)],
        "k: long, status: string, price: double",
    )
    got = _report(
        df,
        [
            ("not_null", "k"),
            ("unique", "k"),
            ("values_in", "status", ("O", "F")),
            ("min_at_least", "price", 0.0),
            ("max_at_most", "price", 100.0),
            ("row_count_between", 1, 10),
        ],
    )
    assert all(passed for _, passed in got.values())


def test_null_semantics(spark):
    # values_in ignores NULLs; min/max bounds pass vacuously on an
    # all-NULL column (not_null is the check that owns NULLs).
    df = spark.createDataFrame(
        [(None, None)], "status: string, price: double"
    )
    got = _report(
        df,
        [
            ("values_in", "status", ("O",)),
            ("min_at_least", "price", 0.0),
        ],
    )
    assert got[("values_in", "status")] == (0.0, True)
    assert got[("min_at_least", "price")] == (None, True)


def test_unknown_kind_and_empty_suite_raise(spark):
    df = spark.createDataFrame([(1,)], "k: long")
    with pytest.raises(ValueError):
        expectation_report(df, [("frobnicate", "k")])
    with pytest.raises(ValueError):
        expectation_report(df, [])


def test_referential_check_counts_orphans_not_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk: long"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk: long")
    r = referential_check(child, "fk", parent, "pk").collect()[0]
    assert (r["observed"], r["passed"]) == (1.0, False)


def test_suite_compiles_to_one_scan(spark):
    """The whole point: N expectations, ONE pass. The physical plan
    must contain exactly one scan of the input relation."""
    df = spark.createDataFrame(
        [(1, "O", 10.0)], "k: long, status: string, price: double"
    )
    plan = expectation_report(
        df,
        [
            ("not_null", "k"),
            ("unique", "k"),
            ("values_in", "status", ("O",)),
            ("min_at_least", "price", 0.0),
            ("row_count_between", 1, 10),
        ],
    )._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln
        for ln in plan.splitlines()
        if "LocalTableScan" in ln or "Scan ExistingRDD" in ln
    ]
    assert len(scans) == 1, plan
