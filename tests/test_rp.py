"""Random projection search (operators/rp.py): seed determinism,
sign-matrix distribution and cross-engine derivation, recall floor."""

from __future__ import annotations

import duckdb

from conversation_with_vector_db_spark.operators.rp import (
    rp_signs,
    rp_topk,
)


def test_signs_deterministic_and_achlioptas_distributed():
    a = rp_signs(64, 32)
    b = rp_signs(64, 32)
    assert a == b
    flat = [x for row in a for x in row]
    assert set(flat) <= {-1.0, 0.0, 1.0}
    nz = sum(1 for x in flat if x != 0.0)
    # Achlioptas density 1/3: 2048 cells -> ~683 nonzero; allow 5 sigma.
    assert 550 <= nz <= 820
    assert rp_signs(64, 32, seed="other") != a


def test_signs_match_sql_md5_derivation():
    """The oracle's entire trust chain is md5(seed:i:j) agreeing
    between hashlib and SQL — pin it cell by cell for a sample."""
    signs = rp_signs(8, 4)
    con = duckdb.connect()
    for i in (1, 3, 8):
        for j in (1, 2, 4):
            (u,) = con.execute(
                "SELECT CAST(('0x' || substr(md5('rp:' || ? || ':' "
                "|| ?), 1, 8)) AS BIGINT) % 6",
                [str(i), str(j)],
            ).fetchone()
            want = 1.0 if u == 0 else (-1.0 if u == 1 else 0.0)
            assert signs[j - 1][i - 1] == want


def test_recall_floor_and_exactness_at_full_cand(spark, sf_dir):
    from conversation_with_vector_db_spark.operators.vector import (
        brute_force_topk,
    )
    from conversation_with_vector_db_spark.session import load_tables

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    from pyspark.sql import functions as F

    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["qid"], r["vec_id"])
        for r in brute_force_topk(emb, q, k=10).collect()
    }
    got = {
        (r["qid"], r["vec_id"])
        for r in rp_topk(
            emb, q, dim_in=64, dim_out=32, k=10, cand=200
        ).collect()
    }
    # Isotropic-fixture floor (the documented thin-margin regime).
    assert len(got & exact) / len(exact) >= 0.8
    # cand >= corpus size makes the cut a no-op: result must be exact.
    n = emb.count()
    full = {
        (r["qid"], r["vec_id"])
        for r in rp_topk(
            emb, q, dim_in=64, dim_out=32, k=10, cand=n
        ).collect()
    }
    assert full == exact


def test_arrow_kernel_matches_literal_fold_kernel(spark, sf_dir):
    from pyspark.sql import functions as F

    from conversation_with_vector_db_spark.operators.rp import (
        rp_topk_arrow,
    )
    from conversation_with_vector_db_spark.session import load_tables

    load_tables(spark, sf_dir)
    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    jvm = {
        (r["qid"], r["vec_id"], r["rank"], r["sim"])
        for r in rp_topk(
            emb, q, dim_in=64, dim_out=32, k=10, cand=200
        ).collect()
    }
    arrow = {
        (r["qid"], r["vec_id"], r["rank"], r["sim"])
        for r in rp_topk_arrow(
            emb, q, dim_in=64, dim_out=32, k=10, cand=200
        ).collect()
    }
    assert jvm == arrow


def test_arrow_kernel_null_and_ragged_rows_excluded(spark):
    from conversation_with_vector_db_spark.operators.rp import (
        rp_project_arrow,
        rp_signs,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0, 4.0]),
            (2, None),
            (3, [1.0, 2.0]),  # ragged
        ],
        "vec_id: long, embedding: array<double>",
    )
    rows = {
        r["vec_id"]: r["y"]
        for r in rp_project_arrow(df, rp_signs(4, 2)).collect()
    }
    assert rows[2] is None and rows[3] is None
    assert rows[1] is not None and len(rows[1]) == 2
