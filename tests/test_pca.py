"""PCA (operators/pca.py): covariance correctness vs numpy, power
iteration on a known spectrum, planted dominant direction, and
NULL/ragged handling."""

from __future__ import annotations

import numpy as np

from conversation_with_vector_db_spark.operators.pca import (
    collect_covariance,
    pca_top_component,
    power_iterate,
)


def test_covariance_matches_numpy(spark):
    rng = np.random.RandomState(7)
    X = rng.randn(300, 6)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id: long, embedding: array<double>",
    )
    C, mu, n = collect_covariance(df, dim=6)
    assert n == 300
    np.testing.assert_allclose(mu, X.mean(axis=0), rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        C, np.cov(X, rowvar=False, bias=True), rtol=0, atol=1e-10
    )


def test_power_iteration_known_spectrum():
    C = np.diag([9.0, 1.0, 0.25])
    v, ray, evr = power_iterate(C, iters=3)
    # Dominant eigenvector is e1; 3 iterations from all-ones leave a
    # small but strictly-shrinking residual.
    assert abs(abs(v[0]) - 1.0) < 5e-3
    assert abs(ray - 9.0) < 0.1
    assert abs(evr - 9.0 / 10.25) < 0.01


def test_planted_direction_recovered(spark):
    rng = np.random.RandomState(11)
    u = np.zeros(8)
    u[3] = 1.0
    X = rng.randn(500, 1) * 5.0 @ u[None, :] + rng.randn(500, 8) * 0.1
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id: long, embedding: array<double>",
    )
    rows = pca_top_component(spark, df, dim=8).collect()
    loadings = {r["i"]: r["loading"] for r in rows}
    assert abs(abs(loadings[4]) - 1.0) < 0.01  # 1-based dim 4 == u[3]
    evr = rows[0]["explained_ratio"]
    assert evr > 0.99


def test_null_and_ragged_vectors_skipped(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [3.0, 0.0]),
            (3, None),
            (4, [1.0, 2.0, 3.0]),
        ],
        "vec_id: long, embedding: array<double>",
    )
    C, mu, n = collect_covariance(df, dim=2)
    assert n == 2
    np.testing.assert_allclose(mu, [2.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(C[0, 0], 1.0, atol=1e-12)
