"""Fuzzy record linkage (operators/linkage.py): planted-typo matching,
blocking contract, and the DF cap."""

from __future__ import annotations

from conversation_with_vector_db_spark.operators.linkage import (
    fuzzy_linkage_report,
    fuzzy_value_pairs,
)


def _pairs(df, **kw):
    return {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_value_pairs(df, "name", **kw).collect()
    }


def test_planted_typos_match(spark):
    df = spark.createDataFrame(
        [
            ("acme widget",),
            ("acme widgit",),   # 1 substitution
            ("acme wídget",),   # accented variant, 1 sub
            ("acme bolt",),
            ("zz totally different",),
            (None,),
        ],
        ["name"],
    )
    got = _pairs(df, max_dist=2)
    assert got[("acme widget", "acme widgit")] == 1
    assert got[("acme widget", "acme wídget")] == 1
    # "widget" vs "bolt" share the "acme" block but exceed the bound.
    assert ("acme bolt", "acme widget") not in got
    assert all("zz totally different" not in p for p in got)


def test_no_shared_token_is_out_of_scope(spark):
    # dist("cat x", "bat y") = 2 but no shared token: the blocking
    # predicate is part of the contract, not an approximation.
    df = spark.createDataFrame([("cat x",), ("bat y",)], ["name"])
    assert _pairs(df, max_dist=3) == {}


def test_token_df_cap_drops_stop_token_blocks(spark):
    # Every value shares the stop token "the"; with the cap below the
    # block size, no candidates survive blocking.
    df = spark.createDataFrame(
        [("the aa",), ("the ab",), ("the ac",), ("the ad",)], ["name"]
    )
    assert _pairs(df, max_dist=1, max_token_df=2) == {}
    got = _pairs(df, max_dist=1, max_token_df=10)
    assert ("the aa", "the ab") in got


def test_report_row_counts(spark):
    df = spark.createDataFrame(
        [("large bolt",)] * 3 + [("large bolts",)] * 2, ["name"]
    )
    rows = fuzzy_linkage_report(df, "name", max_dist=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["name_a"], r["name_b"]) == ("large bolt", "large bolts")
    assert (r["rows_a"], r["rows_b"]) == (3, 2)
    assert r["dist"] == 1


def test_value_level_pairing_ignores_row_duplication(spark):
    # 1000 duplicate rows of one value must not inflate the pair set:
    # linkage runs on the distinct value domain.
    df = spark.createDataFrame(
        [("dup name",)] * 1000 + [("dup name2",)], ["name"]
    )
    got = _pairs(df, max_dist=1)
    assert got == {("dup name", "dup name2"): 1}
