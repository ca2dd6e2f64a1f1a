#!/usr/bin/env python3
"""Round-11 continuation experiments (guide §1: measure first).

Three controlled questions, each under the bench harness's own session
shape (data-sized shuffle partitions, AQE cost gate, pinned scoped
caches, prepare-once / noop-sink exec):

1. ``--parts-ab``: does the 8-partition data-sized floor starve the
   CPU-bound aggregate stages at sf0.1?  Runs the headline set twice
   in separate sessions (parts=8 vs parts=<cpus>) and prints per-query
   min-of-N exec for both.
2. ``--ngram-decomp``: stage decomposition of dedup_ngram_jaccard's
   pair pipeline (cached postings scan / +explode / +filtered explode /
   +groupBy / full query) so the aggregate's share is measured, not
   assumed.
3. ``--duck-ab``: dedup_embedding_cosine + dedup_ngram_jaccard exec
   samples with (a) no duckdb at all, (b) a duckdb connection running
   the paired oracles interleaved (bench regime), (c) same but the
   connection closed right after each duck pass — attributes the
   co-residency inflation to the duck lifecycle vs host noise.

Usage: python tools/r11_experiments.py --parts-ab [--passes 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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


def _fresh_session(parts: int, adaptive: bool):
    from conversation_with_vector_db_spark import fixtures
    from conversation_with_vector_db_spark.session import (
        get_spark,
        load_tables,
    )

    spark = get_spark(
        app_name=f"r11exp-p{parts}",
        master=f"local[{CPUS}]",
        shuffle_partitions=parts,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", str(adaptive).lower())
    load_tables(spark, SF_DIR)
    fixtures.register_derived_views(spark)
    for t in ("events", "documents", "embeddings", "corpus", "usage",
              "users", "prompts"):
        spark.table(t).cache().count()
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _prepare(spark, names):
    from conversation_with_vector_db_spark.operators import cache as oc
    from conversation_with_vector_db_spark.plans import registry

    qs = registry.all_queries()
    # warm-up: first query once untimed
    _noop(qs[names[0]](spark, SF_DIR))
    oc.pin_generations()
    prepared = {}
    for n in names:
        df = None
        for _ in range(2):
            df = qs[n](spark, SF_DIR)
        prepared[n] = df
    for n in names:  # materialization pass (untimed)
        _noop(prepared[n])
    return prepared


def _sample(prepared, names, passes):
    samples = {n: [] for n in names}
    for _ in range(passes):
        for n in names:
            t0 = time.perf_counter()
            _noop(prepared[n])
            samples[n].append(time.perf_counter() - t0)
    return samples


def run_set(parts, adaptive, names, passes, label):
    from conversation_with_vector_db_spark.operators import cache as oc

    spark = _fresh_session(parts, adaptive)
    spark.sparkContext.setJobDescription(label)
    prepared = _prepare(spark, names)
    samples = _sample(prepared, names, passes)
    out = {n: round(min(s), 4) for n, s in samples.items()}
    oc.unpin_generations()
    oc.release_all()
    spark.stop()
    return out, samples


def parts_ab(passes):
    names = HEADLINE
    base, _ = run_set(8, False, names, passes, "parts=8")
    wide, _ = run_set(CPUS, False, names, passes, f"parts={CPUS}")
    print(json.dumps({"parts8": base, f"parts{CPUS}": wide,
                      "parts8_sum": round(sum(base.values()), 3),
                      f"parts{CPUS}_sum": round(sum(wide.values()), 3)},
                     indent=1))


def ngram_decomp(passes, parts):
    from pyspark.sql import functions as F

    from conversation_with_vector_db_spark.operators import cache as oc
    from conversation_with_vector_db_spark.operators.dedup import (
        pair_counts_from_sized_lists,
    )
    from conversation_with_vector_db_spark.plans import registry
    from conversation_with_vector_db_spark.plans.dedup import (
        _docs_bytes,
        _shared_dedup_index,
    )

    spark = _fresh_session(parts, False)
    oc.pin_generations()
    qs = registry.all_queries()
    full = qs["dedup_ngram_jaccard"](spark, SF_DIR)
    _noop(full)  # materialize caches

    # re-derive the sized posting lists exactly as the plan does
    from conversation_with_vector_db_spark.operators.cache import (
        scoped_cache,
    )
    from conversation_with_vector_db_spark.operators.dedup import (
        doc_shingle_lists,
        fused_capped_postings,
        exploded_shingles,
        sized_postings_from_lists,
    )

    corpus = spark.table("corpus")
    postings = scoped_cache(
        fused_capped_postings(exploded_shingles(corpus), "doc_id", 64)
    )
    lists = scoped_cache(doc_shingle_lists(postings))
    sized = scoped_cache(sized_postings_from_lists(lists))
    _noop(sized)

    common = pair_counts_from_sized_lists(sized, 0.5)
    # pair explode WITHOUT the aggregate — the SHIPPED expression,
    # imported so the decomposition can never drift from the operator
    # (ADVICE r11).
    from conversation_with_vector_db_spark.operators.dedup import (
        sized_pair_longs,
    )

    exploded = sized.select(
        F.explode(sized_pair_longs(0.5)).alias("_ab")
    )

    # Alternative A: JVM groupBy at higher parallelism is covered by
    # --parts-ab (the exchange partition count is the session conf).
    # Alternative B: replace partial+final JVM hash agg with ONE
    # repartition + pyarrow value_counts per partition (guide §4.2) —
    # no partial-agg map build, vectorized counting.
    import pyarrow as pa

    def _vc(it):
        batches = list(it)
        if not batches:
            return
        t = pa.Table.from_batches(batches)
        vc = t.column("_ab").combine_chunks().value_counts()
        yield pa.RecordBatch.from_arrays(
            [vc.field("values"), vc.field("counts").cast(pa.int64())],
            ["_ab", "common"],
        )

    arrow_common = (
        exploded.repartition(CPUS, "_ab")
        .mapInArrow(_vc, "_ab long, common long")
        .select(
            F.shiftright("_ab", 32).alias("a"),
            (F.col("_ab") % F.lit(1 << 32)).alias("b"),
            "common",
        )
    )

    stages = {
        "sized_scan": sized,
        "explode_filtered": exploded,
        "explode_plus_groupby": common,
        "explode_plus_arrow_vc": arrow_common,
        "full_query": full,
    }
    res = {}
    for label, df in stages.items():
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            _noop(df)
            best = min(best, time.perf_counter() - t0)
        res[label] = round(best, 4)
    n_occ = exploded.count()
    n_groups = common.count()
    res["pair_occurrences"] = n_occ
    res["distinct_pairs"] = n_groups
    res["arrow_vc_matches_groupby"] = sorted(
        map(tuple, arrow_common.collect())
    ) == sorted(map(tuple, common.collect()))
    print(json.dumps(res, indent=1))
    oc.unpin_generations()
    oc.release_all()
    spark.stop()


def duck_ab(passes):
    import duckdb

    from conversation_with_vector_db_spark.operators import cache as oc
    from conversation_with_vector_db_spark.plans import registry
    from conversation_with_vector_db_spark.session import (
        BASE_TABLES,
        table_path,
    )

    names = HEADLINE
    probe = ["dedup_embedding_cosine", "dedup_ngram_jaccard"]
    oracles = registry.all_oracles()
    duck_names = [n for n in names if n in oracles]

    spark = _fresh_session(8, False)
    prepared = _prepare(spark, names)

    def duck_pass(con):
        for n in duck_names:
            con.execute(oracles[n]).fetchall()

    def new_con():
        con = duckdb.connect()
        for t in BASE_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{table_path(SF_DIR, t)}'"
            )
        return con

    out = {}
    # regime A: spark alone
    sa = _sample(prepared, names, passes)
    out["alone"] = {n: round(min(sa[n]), 4) for n in probe}
    out["alone_sum"] = round(sum(min(s) for s in sa.values()), 3)
    # regime B: bench regime - persistent con, duck pass between spark passes
    con = new_con()
    duck_pass(con)  # warm
    sb = {n: [] for n in names}
    for _ in range(passes):
        for n in names:
            t0 = time.perf_counter()
            _noop(prepared[n])
            sb[n].append(time.perf_counter() - t0)
        duck_pass(con)
    con.close()
    out["interleaved_persistent_con"] = {
        n: round(min(sb[n]), 4) for n in probe
    }
    out["interleaved_sum"] = round(sum(min(s) for s in sb.values()), 3)
    # regime C: interleaved but con closed after each duck pass
    sc = {n: [] for n in names}
    for _ in range(passes):
        for n in names:
            t0 = time.perf_counter()
            _noop(prepared[n])
            sc[n].append(time.perf_counter() - t0)
        c = new_con()
        duck_pass(c)
        c.close()
    out["interleaved_fresh_con"] = {
        n: round(min(sc[n]), 4) for n in probe
    }
    out["interleaved_fresh_sum"] = round(
        sum(min(s) for s in sc.values()), 3
    )
    out["samples"] = {
        "alone": {n: [round(x, 3) for x in sa[n]] for n in probe},
        "persistent": {n: [round(x, 3) for x in sb[n]] for n in probe},
        "fresh": {n: [round(x, 3) for x in sc[n]] for n in probe},
    }
    print(json.dumps(out, indent=1))
    oc.unpin_generations()
    oc.release_all()
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts-ab", action="store_true")
    ap.add_argument("--ngram-decomp", action="store_true")
    ap.add_argument("--duck-ab", action="store_true")
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--parts", type=int, default=8)
    args = ap.parse_args()
    if args.parts_ab:
        parts_ab(args.passes)
    if args.ngram_decomp:
        ngram_decomp(args.passes, args.parts)
    if args.duck_ab:
        duck_ab(args.passes)
