"""Scale-technique queries: skew-safe aggregation/join and the MLlib
LSH ANN variant — the operators whose POINT is the physical strategy;
results are oracle-identical to their naive forms (that's the
correctness claim of a physical rewrite)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ann import exact_baseline, recall_at_k
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
    doc="""T6 (MLlib fidelity): BucketedRandomProjectionLSH over
    L2-normalized vectors (Euclidean NN on the unit sphere == cosine
    NN), approxSimilarityJoin against the 5 query vectors, exact
    rescoring, recall@10 vs brute force — the stock-MLlib counterpart
    of the hand-rolled hyperplane LSH.""",
    oracle=None,
)
def ann_brp_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    from ..operators.vector import cosine_similarity, topk_per_query

    emb = spark.table("embeddings")
    vecs = emb.withColumn("_raw", array_to_vector("embedding"))
    normed = Normalizer(inputCol="_raw", outputCol="_features", p=2.0).transform(
        vecs
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=0.5,
        numHashTables=4,
        seed=42,
    )
    model = lsh.fit(normed)
    queries_df = normed.filter(F.col("vec_id") < 5)
    # approxSimilarityJoin on unit vectors: euclid^2 = 2 - 2*cosine,
    # so distance 1.3 ~ cosine 0.155 — the net must reach past the
    # top-10 sims of UNIFORM vectors (~0.3), the ANN-hardest case.
    joined = model.approxSimilarityJoin(
        queries_df, normed, 1.3, distCol="_dist"
    ).select(
        F.col("datasetA.vec_id").alias("qid"),
        F.col("datasetB.vec_id").alias("vec_id"),
        F.round(
            cosine_similarity(
                F.col("datasetA.embedding"), F.col("datasetB.embedding")
            ),
            4,
        ).alias("sim"),
    )
    approx = topk_per_query(joined, 10, tiebreak_col="vec_id")
    exact = exact_baseline(emb, emb.filter(F.col("vec_id") < 5), k=10)
    return recall_at_k(approx, exact, k=10).withColumn(
        "method", F.lit("mllib_brp_lsh_4tables")
    )
