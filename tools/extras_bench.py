"""One-off measurement of the r8-late operator family (SemDeDup, BPE,
DSIR) vs their DuckDB oracles at a given sf — NOT part of bench.py's
headline (the headline set is pinned for round-over-round
comparability; these queries are model-driven, so their wall includes
the driver-collected fit loops and is reported as WALL, not exec).

Usage: python tools/extras_bench.py [sf_dir]  ->  one JSON line +
BENCH_EXTRAS.json next to the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re as _re


def plan_input_tables(df, sf_dir: str) -> set[str]:
    """Base tables a query's Spark plan actually SCANS, derived from
    the analyzed plan's file list (``df.inputFiles()``) mapped back to
    the fixture's table paths. Works for rows-only queries (no oracle
    SQL) — the class the old SQL-regex guard silently bypassed — and
    never false-positives on a table name inside a SQL comment or
    string literal (ADVICE r10). Paths that are not base-table
    fixtures (index dirs, snapshot stores) simply don't match."""
    from conversation_with_vector_db_spark.session import (
        BASE_TABLES,
        table_path,
    )

    roots = {
        t: os.path.abspath(table_path(sf_dir, t)) for t in BASE_TABLES
    }
    found: set[str] = set()
    for f in df.inputFiles():
        p = os.path.abspath(_re.sub(r"^file:(//)?", "", f))
        for t, r in roots.items():
            if p == r or p.startswith(r + os.sep):
                found.add(t)
    return found


def sql_input_tables(sql: str | None) -> set[str]:
    """Base tables referenced by the oracle SQL, with line comments
    and single-quoted string literals stripped first so a table name
    mentioned in prose can't spuriously skip a query (ADVICE r10).
    Complements the plan-derived set: a query whose BUILD phase reads
    a table eagerly (fit loops, store creation) may return a frame
    that no longer scans it, but the oracle still names it."""
    from conversation_with_vector_db_spark.session import BASE_TABLES

    if not sql:
        return set()
    s = _re.sub(r"''", " ", sql)          # escaped quote inside literal
    s = _re.sub(r"'[^']*'", " ", s)
    s = _re.sub(r"--[^\n]*", " ", s)
    return {t for t in BASE_TABLES if _re.search(rf"\b{t}\b", s)}


def placeholder_inputs_for(
    df, sql: str | None, sf_dir: str, at_scale: set[str]
) -> list[str]:
    """Sorted placeholder tables this query would read in a restricted
    fixture — the union of what the Spark plan scans and what the
    oracle names, minus the at-scale set. Non-empty means REFUSE to
    time (the r9 sf100 artifact's a19 row read a placeholder lineitem
    and published 116x)."""
    return sorted(
        (plan_input_tables(df, sf_dir) | sql_input_tables(sql))
        - at_scale
    )


QUERIES = [
    "dedup_semantic_semdedup",
    "dedup_semantic_incremental",
    "text_bpe_merges",
    "text_bpe_encode",
    "scale_dsir_selection",
    "scale_psi_drift",
    "a18_sessionization",
    "a19_exact_percentiles",
    "a19b_grouped_median",
    "a20_funnel_conversion",
    "a21_retention_cohorts",
    "w6_scd2_intervals",
    "text_cms_freq",
    "text_heavy_hitters_sketch",
    "a17_gapfill_locf",
    "j15_asof_attribution",
    "j16_interval_attribution",
    # Second continuation session additions:
    "dedup_fuzzy_linkage",
    "v11_rp_topk",
    "m12_quality_expectations",
    "scale_weighted_sample",
    "scale_pca_power",
    "graph_pagerank_bipartite",
    "m14_delete_where_lifecycle",
    "m13_merge_into_lifecycle",
    "s17_schema_evolution_lifecycle",
    "graph_label_communities",
    "a23_rolling_anomaly",
    # Third continuation session additions:
    "m16_table_changes",
    "m17_check_constraints",
    "m18_restore_lifecycle",
    "m19_merge_sync_by_source",
    "a25_ivm_group_aggregate",
    "a26_ivm_minmax_aggregate",
    "d9_sql_udtf_lateral",
    "c23_variant_json",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # Optional comma-separated subset (argv[2]): sf1 runs split the
    # list because the semantic family's unrolled oracles run minutes
    # at that scale; partial runs MERGE into the existing json.
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # sf10 sweeps run each engine once (the oracle side runs minutes
    # there); the default stays min-of-3 for sf<=1 comparability.
    runs = int(os.environ.get("EXTRAS_RUNS", "3"))
    # Shuffle partitions default to 8 (right for the sub-GB sf<=1
    # fixtures, where more partitions only add scheduler floor); sf10
    # sweeps pass the core count — on a real cluster this is sized to
    # the data, and leaving 8 at 10M-row shuffles idles 3/4 of the
    # machine inside every window/groupBy stage.
    shuffle = int(os.environ.get("EXTRAS_SHUFFLE", "8"))

    import duckdb

    from conversation_with_vector_db_spark.plans import load_all, registry
    from conversation_with_vector_db_spark.session import (
        BASE_TABLES,
        get_spark,
        load_tables,
        table_path,
    )

    # Partial fixture dirs (e.g. an sf100 events-only generation from
    # gen_sf --tables) register only the tables they carry. Entries
    # are stripped and blanks dropped (ADVICE r10: " events" silently
    # matched nothing, skipping every query).
    tables = tuple(
        t.strip()
        for t in os.environ.get(
            "EXTRAS_TABLES", ",".join(BASE_TABLES)
        ).split(",")
        if t.strip()
    )

    load_all()
    spark = get_spark(
        app_name="cvdb-extras-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, sf_dir, tables)
    for t in ("documents", "embeddings"):
        if t in tables:
            spark.table(t).cache().count()

    duck = duckdb.connect()
    for t in BASE_TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            duck.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    # Placeholder guard: an EXTRAS_TABLES-restricted fixture (e.g. the
    # events-only sf100 generation) carries tiny sf0.001 placeholders
    # for every other table so load_tables can register the full view
    # set — a query whose inputs are placeholders would publish a
    # meaningless denominator (the r9 sf100 artifact's a19 row read a
    # placeholder lineitem and showed 116x). Inputs are the UNION of
    # what the Spark plan actually scans (plan_input_tables — covers
    # rows-only queries, which the old SQL-only guard bypassed) and
    # what the oracle SQL names outside comments/literals; any query
    # touching a table outside the at-scale set is REFUSED and
    # recorded under "skipped_placeholder_inputs" instead.
    restricted = os.environ.get("EXTRAS_TABLES") is not None
    at_scale = set(tables)

    out: dict[str, dict[str, float]] = {}
    skipped: dict[str, list[str]] = {}
    for name in QUERIES:
        if only is not None and name not in only:
            continue
        q = registry.REGISTRY[name]
        sql = q.oracle_sql
        if restricted:
            placeholder_inputs = placeholder_inputs_for(
                q.fn(spark, sf_dir), sql, sf_dir, at_scale
            )
            if placeholder_inputs:
                skipped[name] = placeholder_inputs
                print(
                    f"SKIP {name}: reads placeholder tables "
                    f"{placeholder_inputs} in this restricted fixture",
                    file=sys.stderr,
                )
                continue
        # warm-up (codegen + any scoped caches), then min-of-N wall —
        # BOTH engines warm unconditionally so a single-run sweep never
        # compares warmed Spark to cold DuckDB.
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls = []
        for _ in range(runs):
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
        ducks = []
        duck.sql(sql).fetchall()
        for _ in range(runs):
            t0 = time.time()
            duck.sql(sql).fetchall()
            ducks.append(time.time() - t0)
        out[name] = {
            "spark_wall_sec": round(min(walls), 4),
            "duckdb_sec": round(min(ducks), 4),
            "ratio": round(min(walls) / max(min(ducks), 1e-9), 2),
        }

    doc = {
        "sf_dir": sf_dir,
        "note": (
            "model-driven queries: spark_wall_sec includes the "
            "driver-collected fit loops (Lloyd iterations / BPE argmax "
            "collects), i.e. build+exec wall, min-of-3 after warm-up"
        ),
        "queries": out,
    }
    if skipped:
        doc["skipped_placeholder_inputs"] = skipped
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(
        root, os.environ.get("EXTRAS_OUT", "BENCH_EXTRAS.json")
    )
    if only is not None and os.path.exists(path):
        # Partial run: merge new per-query rows into the existing doc.
        with open(path) as f:
            prior = json.load(f)
        prior.get("queries", {}).update(out)
        prior["sf_dir"] = sf_dir
        if skipped:
            prior.setdefault(
                "skipped_placeholder_inputs", {}
            ).update(skipped)
            for name in skipped:
                prior.get("queries", {}).pop(name, None)
        doc = prior
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
