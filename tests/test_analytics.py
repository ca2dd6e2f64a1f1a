"""Analytics family (SURVEY §2.7, §3.3): DuckDB-oracle parity at sf0.001."""

from __future__ import annotations

import pytest

from conversation_with_vector_db_spark.testing import assert_parity

ANALYTICS_QUERIES = [
    "flagship_usage_daily_by_user",
    "a2_global_rollup",
    "a3_conditional_aggregate",
    "a8_per_model_period_usage",
    "a11_budget_running_decrement",
    "c14_cost_formula",
]


@pytest.mark.parametrize("name", ANALYTICS_QUERIES)
def test_parity(spark, duck, sf_dir, name):
    assert assert_parity(spark, duck, name, sf_dir) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "usage_count" in df.columns


def test_registry_contract():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
