"""PCA over embedding columns: distributed second-moment collection +
deterministic power iteration — the LEARNED linear projection next to
:mod:`.rp`'s oblivious one (RP needs no data; PCA spends one corpus
pass to align the projection with the data's actual variance).

Scale decomposition (what runs where):

* **Corpus-scale** (the only part that touches n rows): the moment
  pass. One ``mapInPandas`` sweep emits per-batch partial sums of
  ``x x^T`` (d*d), ``x`` (d) and the row count as (pos, val) pairs;
  a pos-keyed sum reduces them — classic map-side-combined
  aggregation, never a shuffle of vectors. Covariance assembles from
  the moments as ``C = S/n - mu mu^T`` (the uncentered identity; the
  oracle uses the SAME formula so both engines do the same
  arithmetic — embeddings are near-zero-mean, so no cancellation).
* **Driver-scale** (d x d, tiny by construction — same contract as
  collected centroids/query vectors): 3 power-iteration steps
  ``v <- normalize(C v)`` from the deterministic all-ones start,
  Rayleigh quotient, explained-variance ratio vs the trace.

The whole pipeline is deterministic arithmetic on the data — no RNG,
no library eigensolver — so an UNROLLED replay of the same three
iterations in ANSI SQL reproduces the loadings to well inside the
4dp rounding, making this the fourth value-parity-checked iterative
family (after quantized Lloyd, the recursive chunk closure, and the
BPE merge chain). numpy is used only for the d x d driver math; a
LAPACK ``eigh`` would converge better but could not be replayed in
SQL, which is the trade this module makes on purpose (3 iterations
of a clearly-dominant first component are plenty; the docstring of
the registry query records the measured Rayleigh/trace).

At 1536-d the moment matrix is 1536^2 = 2.4M partial cells per
batch — still one Arrow pass, ~19 MB of doubles per partition
partial; past a few thousand dims, switch to randomized sketched
PCA (compose with :mod:`.rp`) rather than exact moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_partials(
    df: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """(pos, val) partial moments: pos < d*d carries sum(x_i * x_j)
    flattened row-major, then d slots of sum(x_i), then one count
    slot. NULL/ragged vectors are skipped (they carry no moment)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("pos", LongType()),
            StructField("val", DoubleType()),
        ]
    )
    d = dim

    def part(it):
        S = np.zeros((d, d))
        m = np.zeros(d)
        n = 0
        for pdf in it:
            vecs = pdf[vec_col].to_numpy()
            rows = [
                np.asarray(v, dtype=np.float64)
                for v in vecs
                if v is not None and len(v) == d
            ]
            if not rows:
                continue
            X = np.stack(rows)
            # BLAS batch outer-product accumulation; summation order
            # differs from the oracle's (itself engine-arbitrary), so
            # parity rests on the final 4dp rounding of the loadings,
            # the same contract every cosine plan carries.
            S += X.T @ X
            m += X.sum(axis=0)
            n += len(rows)
        pos = np.arange(d * d + d + 1)
        val = np.concatenate([S.ravel(), m, [float(n)]])
        yield pd.DataFrame({"pos": pos, "val": val})

    return (
        df.select(vec_col)
        .mapInPandas(part, schema)
        .groupBy("pos")
        .agg(F.sum("val").alias("val"))
    )


def collect_covariance(
    df: DataFrame, dim: int, vec_col: str = "embedding"
):
    """(C, mu, n) assembled driver-side from the reduced moments —
    d*d + d + 1 doubles however large the corpus is."""
    import numpy as np

    rows = moment_partials(df, dim, vec_col).collect()
    flat = np.zeros(dim * dim + dim + 1)
    for r in rows:
        flat[int(r["pos"])] = float(r["val"])
    n = flat[-1]
    if n == 0:
        raise ValueError("collect_covariance: no valid vectors")
    S = flat[: dim * dim].reshape(dim, dim)
    mu = flat[dim * dim : dim * dim + dim] / n
    C = S / n - np.outer(mu, mu)
    return C, mu, int(n)


def power_iterate(C, iters: int = 3):
    """3-step power iteration from the all-ones start; returns
    (loadings, rayleigh, explained_ratio). Pure deterministic
    arithmetic — exactly what the SQL oracle unrolls."""
    import numpy as np

    d = C.shape[0]
    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        w = C @ v
        v = w / np.sqrt((w * w).sum())
    Cv = C @ v
    rayleigh = float((v * Cv).sum())
    trace = float(np.trace(C))
    return v, rayleigh, rayleigh / trace if trace else 0.0


def pca_top_component(
    spark,
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    iters: int = 3,
) -> DataFrame:
    """Registry-shaped result: one row per input dimension —
    ``(i, loading, rayleigh_q, explained_ratio)`` with loadings and
    scalars rounded to 4dp (cross-engine ordering stability)."""
    C, _mu, _n = collect_covariance(df, dim, vec_col)
    v, ray, evr = power_iterate(C, iters)
    # + 0.0 normalizes a rounded -0.0 to +0.0 (Python round preserves
    # the sign bit; the SQL oracle's round(...) + 0 does the same).
    rows = [
        (
            i + 1,
            round(float(v[i]), 4) + 0.0,
            round(ray, 4) + 0.0,
            round(evr, 4) + 0.0,
        )
        for i in range(dim)
    ]
    return spark.createDataFrame(
        rows,
        "i: int, loading: double, rayleigh_q: double, "
        "explained_ratio: double",
    )
