#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

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

# Headline queries: one per major operator family (expanded as coverage
# grows). Each is a registered name from the plans registry.
HEADLINE = [
    "flagship_usage_daily_by_user",
    "a2_global_rollup",
    "a8_per_model_period_usage",
    "c14_cost_formula",
    "a11_budget_running_decrement",
    "v1_topk_cosine",
    "t5_rag_query_end_to_end",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "x3_session_window_ttl",
    "w1_first_row_per_thread",
    "j9_company_daily_rollup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    import __spark_entry__ as e
    from conversation_with_vector_db_spark.session import get_spark

    spark = get_spark(
        app_name="cvdb-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = e.queries()
    names = [n for n in HEADLINE if n in qs]
    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not session startup.
    qs[names[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
