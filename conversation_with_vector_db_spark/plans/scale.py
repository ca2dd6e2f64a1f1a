"""Scale-technique queries: skew-safe aggregation/join and the MLlib
LSH ANN variant — the operators whose POINT is the physical strategy;
results are oracle-identical to their naive forms (that's the
correctness claim of a physical rewrite)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_aggregate, salted_join
from .registry import query


@query(
    "scale_salted_aggregate",
    doc="""Skew-safe two-stage aggregation: per-row salt spreads a hot
    key across n_salts reducers, algebraic merge restores exact
    semantics — the oracle is the PLAIN single-stage GROUP BY, proving
    the physical rewrite changes nothing observable.""",
    oracle="""
SELECT event_type,
       count(*) AS n,
       round(sum(value), 4) AS total,
       round(min(value), 4) AS vmin,
       round(max(value), 4) AS vmax
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def scale_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = salted_aggregate(
        spark.table("events"),
        keys=["event_type"],
        aggs={
            "n": "count:*",
            "total_raw": "sum:value",
            "vmin_raw": "min:value",
            "vmax_raw": "max:value",
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n",
        F.round("total_raw", 4).alias("total"),
        F.round("vmin_raw", 4).alias("vmin"),
        F.round("vmax_raw", 4).alias("vmax"),
    ).orderBy("event_type")


@query(
    "scale_salted_join",
    doc="""Skew-safe equi-join (small side replicated x16, big side
    salted per row); oracle is the plain join — identical results,
    different physical placement.""",
    oracle="""
SELECT e.event_type AS event_type, c.c_mktsegment AS segment,
       count(*) AS n
FROM events e
JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
ORDER BY event_type, segment
""",
)
def scale_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = spark.table("events").select(
        "event_type", F.col("user_id").alias("c_custkey")
    )
    small = spark.table("customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(big, small, key="c_custkey", n_salts=16)
    return (
        joined.groupBy(
            "event_type", F.col("c_mktsegment").alias("segment")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "segment")
    )


@query(
    "ann_brp_lsh_recall",
    driver=False,
    doc="""T6 (MLlib fidelity): BucketedRandomProjectionLSH over
    L2-normalized vectors (Euclidean NN on the unit sphere == cosine
    NN), approxSimilarityJoin against the 5 query vectors, exact
    rescoring, recall@10 vs brute force — the stock-MLlib counterpart
    of the hand-rolled hyperplane LSH.""",
    oracle=None,
)
def ann_brp_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ann import brp_recall_report

    return brp_recall_report(spark)
