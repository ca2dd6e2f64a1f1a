"""Measure BOTH heavy-hitters arms (direct JVM aggregate vs
Misra-Gries summary-then-verify) at a given sf — the trade-off record
VERDICT r8 #3 asked for next to the cost gate (operators/sketch.py
DIRECT_BYTES_GATE). Both arms return the identical exact top-20; this
tool times them against the same DuckDB groupBy denominator and merges
a `text_heavy_hitters_arms` entry into the sf-appropriate
BENCH_EXTRAS file.

Usage: python tools/hh_arms.py <sf_dir> <extras_json>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, extras = sys.argv[1], sys.argv[2]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import duckdb
    import pyspark.sql.functions as F

    from conversation_with_vector_db_spark.operators.dedup import (
        normalized_text,
    )
    from conversation_with_vector_db_spark.operators.sketch import (
        heavy_hitters_direct,
        heavy_hitters_exact,
    )
    from conversation_with_vector_db_spark.plans import load_all, registry
    from conversation_with_vector_db_spark.session import (
        get_spark,
        load_tables,
        table_path,
    )

    load_all()
    spark = get_spark(
        app_name="cvdb-hh-arms",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    spark.table("documents").cache().count()

    def grams():
        # Mirrors plans/text_pipeline.text_heavy_hitters_sketch's
        # construction (under-parallel spread + zip_with bigrams).
        docs = spark.table("documents")
        cores = spark.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < cores:
            docs = docs.repartition(cores)
        toks = docs.select(
            F.regexp_extract_all(
                normalized_text(F.col("text")), F.lit("[a-z0-9]+"), 0
            ).alias("_toks")
        ).filter(F.size("_toks") >= 2)
        return toks.select(
            F.explode(
                F.zip_with(
                    F.slice("_toks", 1, F.size("_toks") - 1),
                    F.slice("_toks", 2, F.size("_toks") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("gram")
        )

    def steady(df_fn, n=3):
        df_fn().write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(n):
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        return round(min(walls), 4)

    out = {
        "direct_arm_sec": steady(
            lambda: heavy_hitters_direct(grams(), "gram", 20)
        ),
        # source_bytes=None forces the MG summary-then-verify arm.
        "mg_arm_sec": steady(
            lambda: heavy_hitters_exact(
                grams(), "gram", top=20, k_counters=1024,
                source_bytes=None,
            )
        ),
    }

    duck = duckdb.connect()
    duck.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{table_path(sf_dir, 'documents')}'"
    )
    sql = registry.REGISTRY["text_heavy_hitters_sketch"].oracle_sql
    duck.sql(sql).fetchall()
    ducks = []
    for _ in range(3):
        t0 = time.time()
        duck.sql(sql).fetchall()
        ducks.append(time.time() - t0)
    out["duckdb_sec"] = round(min(ducks), 4)
    out["note"] = (
        "identical exact answer from both arms; the gate "
        "(DIRECT_BYTES_GATE=8GiB source bytes) picks direct here"
    )

    with open(extras) as f:
        doc = json.load(f)
    doc.setdefault("queries", {})["text_heavy_hitters_arms"] = out
    with open(extras, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"sf_dir": sf_dir, "text_heavy_hitters_arms": out}))


if __name__ == "__main__":
    main()
