"""Binary (sign) quantization (operators/bq.py): packing arithmetic,
JVM-only candidate stage, recall on a clustered corpus, and the
decay-with-fixed-cut contract on the uniform fixture."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from conversation_with_vector_db_spark.operators.ann import (
    exact_baseline,
    recall_at_k,
)
from conversation_with_vector_db_spark.operators.bq import (
    WORD_BITS,
    bq_code,
    bq_encode,
    bq_hamming,
    bq_nwords,
    bq_topk,
)


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(23)
    cents = rng.normal(size=(8, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = [
        (int(i), [float(x) for x in cents[i % 8]
                  + rng.normal(size=64) * 0.12])
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8).cache()


def _py_code(vec, nwords):
    words = []
    for w in range(nwords):
        acc = 0
        for x in vec[w * WORD_BITS: (w + 1) * WORD_BITS]:
            acc = acc * 2 + (1 if x > 0 else 0)
        words.append(acc)
    return words


def test_packing_matches_reference_fold(spark):
    rng = np.random.default_rng(5)
    for dim in (7, 63, 64, 126, 130):
        vecs = [[float(x) for x in rng.normal(size=dim)]
                for _ in range(6)]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: list(r["c"])
            for r in df.select(
                "vec_id", bq_code(F.col("embedding"), dim).alias("c")
            ).collect()
        }
        for i, v in enumerate(vecs):
            assert got[i] == _py_code(v, bq_nwords(dim)), (dim, i)


def test_hamming_counts_sign_disagreements(spark):
    rng = np.random.default_rng(9)
    a = [float(x) for x in rng.normal(size=130)]
    b = [float(x) for x in rng.normal(size=130)]
    expect = sum((x > 0) != (y > 0) for x, y in zip(a, b))
    df = spark.createDataFrame(
        [(a, b)], "ea array<double>, eb array<double>"
    )
    got = df.select(
        bq_hamming(
            bq_code(F.col("ea"), 130), bq_code(F.col("eb"), 130)
        ).alias("h")
    ).first()["h"]
    assert got == expect


def test_ansi_mode_cannot_overflow_the_fold(spark):
    """All-positive 63-bit word folds to Long.MAX exactly — the worst
    case the 63-bit word width exists for (a 64-bit fold would throw
    under ANSI or wrap silently without it)."""
    df = spark.createDataFrame(
        [([1.0] * WORD_BITS,)], "embedding array<double>"
    )
    got = df.select(
        bq_code(F.col("embedding"), WORD_BITS).alias("c")
    ).first()["c"]
    assert list(got) == [2 ** 63 - 1]


def test_candidate_stage_is_jvm_only(clustered):
    """Encode + Hamming scoring never crosses into Python: the
    compressed scan must stay at executor-JVM expression eval."""
    q = clustered.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"),
        bq_code(F.col("embedding"), 64).alias("_qcode"),
    )
    scored = bq_encode(clustered, 64).join(F.broadcast(q)).select(
        "qid", "vec_id",
        bq_hamming(F.col("bq_code"), F.col("_qcode")).alias("ham"),
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_recall_on_clustered_corpus(clustered):
    """Where vectors actually cluster (real embeddings), sign-Hamming
    rank preserves cosine rank: recall@10 >= 0.9 at oversample 4."""
    q = clustered.filter(F.col("vec_id") < 5)
    approx = bq_topk(clustered, q, k=10, dim=64, oversample=4)
    exact = exact_baseline(clustered, q, k=10)
    rec = recall_at_k(approx, exact, k=10).first()["recall"]
    assert rec >= 0.9, rec


def test_uniform_fixture_recall_floor(spark, sf_dir):
    """The uniform fixture is the hardest case for every cosine-LSH
    family (sims concentrate at 0 +- 1/sqrt(64)); measured 0.62 at
    sf0.001 / 0.70 at sf0.01, floor with KMeans-free margin."""
    from conversation_with_vector_db_spark.session import load_tables

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    approx = bq_topk(emb, q, k=10, dim=64, oversample=4)
    exact = exact_baseline(emb, q, k=10)
    assert recall_at_k(approx, exact, k=10).first()["recall"] >= 0.5


def test_code_size_arithmetic():
    assert bq_nwords(64) == 2 and bq_nwords(1536) == 25
    # 1536-d: 6 KB of float32 -> 200 B of codes (~30x).
    assert (1536 * 4) / (bq_nwords(1536) * 8) > 30


def test_indexed_path_matches_in_plan_results(clustered, tmp_path):
    """bq_write_index + bq_topk_indexed must return EXACTLY what the
    in-plan bq_topk returns on the same corpus (same cut, same ties,
    same refine), and the persisted code bytes must be a fraction of
    the data bytes."""
    import glob
    import os

    from conversation_with_vector_db_spark.operators.bq import (
        bq_topk_indexed,
        bq_write_index,
    )

    path = str(tmp_path / "bqidx")
    bq_write_index(clustered, path, dim=64)
    q = clustered.filter(F.col("vec_id") < 5)
    spark = clustered.sparkSession
    got = {
        (r["qid"], r["rank"]): (r["vec_id"], r["sim"])
        for r in bq_topk_indexed(
            spark, path, q, k=10, oversample=4
        ).collect()
    }
    expect = {
        (r["qid"], r["rank"]): (r["vec_id"], r["sim"])
        for r in bq_topk(clustered, q, k=10, dim=64, oversample=4).collect()
    }
    assert got == expect

    def _bytes(sub):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(path, sub, "*.parquet"))
        )

    # 64-d doubles -> 2-long codes: codes must be well under half the
    # data bytes even with parquet framing on a small file.
    assert _bytes("codes") < 0.5 * _bytes("data")
