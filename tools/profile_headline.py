#!/usr/bin/env python3
"""Per-query profiling harness for the optimization rounds.

Mirrors bench.py's session setup (same shuffle-partition sizing, same
AQE cost gate, same cache pinning and warm-up) and then, for each
headline query:

* dumps ``.explain("formatted")`` to ``plans/r11/<name>_<tag>.txt``
* times steady-state exec (min over N interleaved passes, noop sink)

Usage:
    python tools/profile_headline.py [--tag before|after] [--passes N]
        [--plans-only] [--queries a,b,c]

Timing output goes to stdout as one JSON dict {name: sec} plus a
per-query job/stage count probe (jobs per exec are a scheduler-floor
proxy at toy scale).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from conversation_with_vector_db_spark.session import (
        BASE_TABLES,
        get_spark,
        load_tables,
        table_path,
    )
    from conversation_with_vector_db_spark.sources.parquet_io import (
        parquet_bytes_on_disk,
    )

    sizes = [
        parquet_bytes_on_disk(table_path(sf_dir, t))
        for t in BASE_TABLES
        if os.path.exists(table_path(sf_dir, t))
    ]
    size_unknown = any(s is None for s in sizes)
    input_bytes = sum(s for s in sizes if s is not None)
    parts = (
        4 * int(cpus)
        if size_unknown
        else max(8, min(4 * int(cpus), input_bytes // (32 << 20) or 8))
    )
    spark = get_spark(
        app_name="cvdb-spark-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(parts),
    )
    spark.sparkContext.setLogLevel("ERROR")
    adaptive = size_unknown or input_bytes > (100 << 20)
    spark.conf.set("spark.sql.adaptive.enabled", str(adaptive).lower())

    from conversation_with_vector_db_spark import fixtures, plans
    from conversation_with_vector_db_spark.plans import registry
    from conversation_with_vector_db_spark.operators import cache as opcache

    plans.load_all()
    qs = registry.all_queries()
    names = (
        [n.strip() for n in args.queries.split(",")]
        if args.queries
        else list(HEADLINE)
    )

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
    qs[names[0]](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    outdir = args.outdir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
    )
    os.makedirs(outdir, exist_ok=True)

    opcache.pin_generations()
    prepared = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        prepared[name] = df
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{args.tag}.txt"), "w") as fh:
            fh.write(plan)
    print(f"plans written to {outdir} (*_{args.tag}.txt)", file=sys.stderr)
    if args.plans_only:
        spark.stop()
        return

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # Materialize (populate pinned caches + codegen) untimed.
    mat = {}
    for name in names:
        t0 = time.perf_counter()
        prepared[name].write.format("noop").mode("overwrite").save()
        mat[name] = round(time.perf_counter() - t0, 4)

    samples: dict[str, list[float]] = {n: [] for n in names}
    jobs: dict[str, int] = {}
    for p in range(args.passes):
        for name in names:
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            ids0 = tracker.getJobIdsForGroup()
            sc.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            prepared[name].write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            sc.setJobDescription(None)
            if p == 0:
                ids1 = tracker.getJobIdsForGroup()
                jobs[name] = len(set(ids1) - set(ids0))
    out = {
        "exec_sec": {n: round(min(s), 4) for n, s in samples.items()},
        "exec_samples": {
            n: [round(x, 4) for x in s] for n, s in samples.items()
        },
        "materialize_sec": mat,
        "jobs_per_exec": jobs,
        "shuffle_partitions": int(parts),
        "adaptive": adaptive,
        "total_exec_sec": round(
            sum(min(s) for s in samples.values()), 4
        ),
    }
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
