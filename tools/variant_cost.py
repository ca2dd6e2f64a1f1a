"""A/B the c23 VARIANT access paths at a given sf (verdict r8 #6).

Three arms over the same aggregate (filter k>50, group by event_type):

- per_query_parse: the registered c23 plan — `parse_json(props)` runs
  inside every query. Zero storage cost, pays the JSON parse per read.
- stored_variant: parse ONCE at write time into a parquet VARIANT
  column (Spark 4 round-trips variant through parquet), then query the
  stored binary-parsed value — the "parse-once-and-store" arm.
- stored_shredded: extract the typed access path (`k int`) at write
  time — the fully-shredded arm when the read paths are known upfront.

Reports the one-time materialize wall separately from min-of-3 steady
query walls, plus the DuckDB oracle denominator, and merges a
`c23_variant_json_arms` entry into BENCH_EXTRAS_SF1.json (or
$EXTRAS_OUT).

Usage: python tools/variant_cost.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT))
            AS BIGINT) AS k_sum,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT))
            AS INT) AS k_max
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
GROUP BY event_type
ORDER BY event_type
"""


def steady(run, n=3):
    run()  # warm-up: codegen + file listing
    walls = []
    for _ in range(n):
        t0 = time.time()
        run()
        walls.append(time.time() - t0)
    return round(min(walls), 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import duckdb
    import pyspark.sql.functions as F

    from conversation_with_vector_db_spark.plans import load_all, registry
    from conversation_with_vector_db_spark.session import (
        get_spark,
        load_tables,
        table_path,
    )

    load_all()
    spark = get_spark(
        app_name="cvdb-variant-cost",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir)
    q = registry.REGISTRY["c23_variant_json"]

    def agg(ev):
        return (
            ev.where(F.col("k") > 50)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("k").cast("long").alias("k_sum"),
                F.max("k").cast("int").alias("k_max"),
            )
            .orderBy("event_type")
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, object] = {}

    # Arm 1: per-query parse (the registered plan).
    out["per_query_parse_sec"] = steady(
        lambda: noop(q.fn(spark, sf_dir))
    )

    work = tempfile.mkdtemp(prefix="variant_cost_")
    try:
        # Arm 2: parse once, store the VARIANT column.
        vpath = os.path.join(work, "events_variant")
        t0 = time.time()
        spark.table("events").withColumn(
            "props_v", F.parse_json("props")
        ).drop("props").write.mode("overwrite").parquet(vpath)
        out["stored_variant_materialize_sec"] = round(time.time() - t0, 4)
        stored_v = spark.read.parquet(vpath)
        out["stored_variant_query_sec"] = steady(
            lambda: noop(
                agg(
                    stored_v.withColumn(
                        "k", F.variant_get("props_v", "$.k", "int")
                    )
                )
            )
        )

        # Arm 3: shred the known access path to a typed column.
        spath = os.path.join(work, "events_shredded")
        t0 = time.time()
        spark.table("events").withColumn(
            "k", F.variant_get(F.parse_json("props"), "$.k", "int")
        ).drop("props").write.mode("overwrite").parquet(spath)
        out["stored_shredded_materialize_sec"] = round(time.time() - t0, 4)
        stored_s = spark.read.parquet(spath)
        out["stored_shredded_query_sec"] = steady(
            lambda: noop(agg(stored_s))
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    duck = duckdb.connect()
    p = table_path(sf_dir, "events")
    duck.sql(f"CREATE VIEW events AS SELECT * FROM '{p}'")
    duck.sql(ORACLE).fetchall()
    ducks = []
    for _ in range(3):
        t0 = time.time()
        duck.sql(ORACLE).fetchall()
        ducks.append(time.time() - t0)
    out["duckdb_sec"] = round(min(ducks), 4)
    out["note"] = (
        "steady = min-of-3 after warm-up; materialize = one-time "
        "rewrite of the events table (amortized across every "
        "subsequent read on a real table)"
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(
        root, os.environ.get("EXTRAS_OUT", "BENCH_EXTRAS_SF1.json")
    )
    doc = {"queries": {}}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc.setdefault("queries", {})["c23_variant_json_arms"] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"c23_variant_json_arms": out}))


if __name__ == "__main__":
    main()
