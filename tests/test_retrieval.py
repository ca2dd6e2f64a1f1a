"""BM25 + RRF (operators/retrieval.py): hand-computed scores on a
tiny corpus, formula properties, fusion semantics."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from conversation_with_vector_db_spark.operators.retrieval import (
    B,
    K1,
    RRF_K,
    bm25_scores,
    rrf_fuse,
)


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "spark hash join hash"),
        (1, "merge sort merge merge window"),
        (2, "window scan table"),
        (3, "table scan value row"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_bm25(docs, terms):
    toks = {d: t.split(" ") for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for term in terms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            dl = len(t)
            out[d] = out.get(d, 0.0) + idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * dl / avgdl)
            )
    return out


def test_bm25_matches_hand_formula(spark, tiny_docs):
    rows = [(r["doc_id"], r["text"]) for r in tiny_docs.collect()]
    expect = _ref_bm25(rows, ("hash", "merge", "window"))
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(tiny_docs, ("hash", "merge", "window")).collect()
    }
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], rel=1e-12), d


def test_bm25_nonmatching_docs_absent(spark, tiny_docs):
    got = bm25_scores(tiny_docs, ("hash",)).collect()
    assert {r["doc_id"] for r in got} == {0}


def test_bm25_rare_term_outscores_common_at_equal_tf(spark):
    # 'rare' appears in 1 of 6 docs, 'common' in 5 of 6; doc 0 holds
    # one of each at identical tf and dl -> idf must dominate.
    rows = [(0, "rare common")] + [
        (i, "common filler") for i in range(1, 6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rare = {r["doc_id"]: r["bm25"]
            for r in bm25_scores(docs, ("rare",)).collect()}
    common = {r["doc_id"]: r["bm25"]
              for r in bm25_scores(docs, ("common",)).collect()}
    assert rare[0] > common[0]


def test_rrf_union_semantics(spark):
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(3, 1), (4, 2)], "doc_id long, rank int"
    )
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b]).collect()}
    k = float(RRF_K)
    assert got[1] == pytest.approx(1 / (k + 1))
    assert got[3] == pytest.approx(1 / (k + 3) + 1 / (k + 1))
    assert got[4] == pytest.approx(1 / (k + 2))
    # id present in BOTH lists at modest ranks beats a single top-1.
    assert got[3] > got[1]


def test_rrf_is_pure_plan_no_python(spark):
    a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    fused = rrf_fuse([a, a])
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_indexed_bm25_matches_inline_and_prunes(spark, sf_dir, tmp_path):
    """bm25_write_index + bm25_scores_indexed: identical scores to the
    inline form on the documents fixture, and the postings scan lists
    ONLY the query terms' bucket directories."""
    from conversation_with_vector_db_spark.operators.retrieval import (
        N_TERM_BUCKETS,
        bm25_scores_indexed,
        bm25_write_index,
    )
    from conversation_with_vector_db_spark.session import load_tables

    load_tables(spark, sf_dir)
    docs = spark.table("documents")
    path = str(tmp_path / "lexidx")
    bm25_write_index(docs, path)

    terms = ("hash", "merge", "window")
    inline = {
        r["doc_id"]: round(r["bm25"], 9)
        for r in bm25_scores(docs, terms).collect()
    }
    indexed_df = bm25_scores_indexed(spark, path, terms)
    indexed = {
        r["doc_id"]: round(r["bm25"], 9)
        for r in indexed_df.collect()
    }
    assert indexed == inline

    import zlib

    # Partition pruning is a physical-plan fact (inputFiles() lists
    # the pre-pruning FileIndex): assert the scan carries the bucket
    # IN-list as a PartitionFilter.
    want = sorted(
        zlib.crc32(t.encode()) % N_TERM_BUCKETS for t in terms
    )
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    inlist = ",".join(str(b) for b in want)
    assert f"bucket#" in plan and f"IN ({inlist})" in plan, plan[:2000]


def test_term_bucket_spark_matches_zlib(spark):
    import zlib

    from conversation_with_vector_db_spark.operators.retrieval import (
        N_TERM_BUCKETS,
        _term_bucket,
    )

    words = ["hash", "merge", "window", "spark", "a", "table", "x" * 40]
    df = spark.createDataFrame([(w,) for w in words], "t string")
    got = {
        r["t"]: r["b"]
        for r in df.select(
            "t", _term_bucket(F.col("t")).alias("b")
        ).collect()
    }
    for w in words:
        assert got[w] == zlib.crc32(w.encode()) % N_TERM_BUCKETS, w
