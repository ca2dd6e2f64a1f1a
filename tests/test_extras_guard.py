"""The extras-bench placeholder guard (tools/extras_bench.py): in an
EXTRAS_TABLES-restricted fixture, any query reading a table that is
only a tiny placeholder must be REFUSED-and-recorded, never timed —
including ROWS-ONLY queries (no oracle SQL), which the r10 SQL-regex
guard silently bypassed, and never spuriously skipped because a table
name appears inside a SQL comment or string literal (ADVICE r10)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from extras_bench import (  # noqa: E402
    placeholder_inputs_for,
    plan_input_tables,
    sql_input_tables,
)

from conversation_with_vector_db_spark.session import (  # noqa: E402
    load_tables,
)


@pytest.fixture()
def views(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark


def test_plan_inputs_derived_from_scanned_files(views, sf_dir):
    df = views.table("documents").crossJoin(
        views.table("embeddings").limit(1)
    )
    assert plan_input_tables(df, sf_dir) == {"documents", "embeddings"}
    # driver-only frames scan nothing
    one = views.range(1)
    assert plan_input_tables(one, sf_dir) == set()


def test_rows_only_query_over_placeholder_is_refused(views, sf_dir):
    """The VERDICT r10 done-criterion: a query with NO oracle SQL
    (rows-only) whose plan scans a placeholder table must be skipped
    in a restricted fixture — the old `if restricted and sql:` guard
    let exactly this class through to publish placeholder walls."""
    df = views.table("documents").selectExpr("count(*) AS n")
    got = placeholder_inputs_for(df, None, sf_dir, at_scale={"events"})
    assert got == ["documents"]
    # and at-scale inputs pass
    ev = views.table("events").limit(5)
    assert placeholder_inputs_for(
        ev, None, sf_dir, at_scale={"events"}
    ) == []


def test_sql_comments_and_literals_do_not_false_positive():
    sql = (
        "-- events would be wrong to count here\n"
        "SELECT 'not the lineitem table' AS note, count(*) AS n\n"
        "FROM orders -- joins documents someday\n"
    )
    assert sql_input_tables(sql) == {"orders"}
    assert sql_input_tables(None) == set()
    # escaped quotes inside a literal don't unbalance the stripper
    assert sql_input_tables(
        "SELECT 'it''s a part literal' FROM customer"
    ) == {"customer"}


def test_union_catches_oracle_only_inputs(views, sf_dir):
    """A build phase may consume a table eagerly and return a frame
    that no longer scans it — the oracle SQL still names it, and the
    union must refuse the query in a restricted fixture."""
    df = views.range(3).selectExpr("id AS n")  # scans nothing
    got = placeholder_inputs_for(
        df,
        "SELECT count(*) AS n FROM lineitem",
        sf_dir,
        at_scale={"events"},
    )
    assert got == ["lineitem"]
