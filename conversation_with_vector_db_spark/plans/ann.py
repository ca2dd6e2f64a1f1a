"""ANN similarity-search queries with recall self-certification
(SURVEY §7 Phase 1 scale path; BASELINE.md 'ANN recall' target).

Approximate results depend on LSH banding / KMeans internals that ANSI
SQL can't express, so these are rows-only for the driver — but each
query RETURNS its own recall@10 against the exact brute force computed
in the same plan, making the quality measurable anyway; pytest asserts
floors on those numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ann import (
    exact_baseline,
    hyperplane_lsh_topk,
    ivf_topk,
    recall_at_k,
)
from .registry import query

K = 10


def _queries(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < 5)


@query(
    "ann_lsh_recall",
    doc="""Random-hyperplane LSH ANN (16 bits, 4 bands, md5-seeded
    planes) vs exact brute force: returns recall@10 + candidate-set
    economics. The sublinear stand-in for Pinecone's HNSW
    (controllers/conversationController.js:32-36).""",
    oracle=None,
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.table("embeddings")
    q = _queries(emb)
    approx = hyperplane_lsh_topk(emb, q, k=K)
    exact = exact_baseline(emb, q, k=K)
    return recall_at_k(approx, exact, k=K).withColumn(
        "method", F.lit("hyperplane_lsh_16b4band")
    )


@query(
    "ann_ivf_recall",
    doc="""IVF ANN (KMeans nlist=16 cells, nprobe=4, seed 42) vs exact:
    returns recall@10. At scale the cell id is a parquet partition
    column and probing = partition pruning.""",
    oracle=None,
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.table("embeddings")
    q = _queries(emb)
    approx = ivf_topk(emb, q, k=K, nlist=16, nprobe=4)
    exact = exact_baseline(emb, q, k=K)
    return recall_at_k(approx, exact, k=K).withColumn(
        "method", F.lit("ivf_kmeans_16c4probe")
    )
