#!/usr/bin/env python3
"""ANN candidate economics at 10^5-10^6 vectors — the scale where
pruning is supposed to pay (bench's per-round `ann_economics` runs at
the sf-proportional 10^4-10^5, where brute force still wins; this tool
measures the claimed ~10^6 crossover instead of extrapolating it).

Same clustered distribution as the bench suite (20 well-separated
centroids, 64-d, noise 0.08 — the realistic embedding shape), corpus
generated vectorized (numpy -> pyarrow -> parquet) because a 10^6-row
createDataFrame would spend minutes serializing Python lists. Query
count held at ~100 ACROSS scales so the numbers isolate corpus-size
scaling, not query-batch growth.

Usage: python tools/ann_scale.py --n 100000 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_corpus(path: str, n: int, dim: int = 64, n_clusters: int = 20,
               noise: float = 0.08, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    centroids = rng.normal(size=(n_clusters, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    vecs = (
        centroids[np.arange(n) * n_clusters // n]
        + rng.normal(size=(n, dim)) * noise
    ).astype(np.float64)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }),
        path,
        compression="zstd",
    )


def run_scale(spark, n: int, workdir: str) -> dict:
    from pyspark.sql import functions as F

    from conversation_with_vector_db_spark.operators.ann import (
        hyperplane_lsh_topk,
        ivf_topk,
        recall_at_k,
        with_lsh_bands,
    )
    from conversation_with_vector_db_spark.operators.vector import (
        collect_query_vectors,
        matmul_topk,
    )

    dim, nlist, nprobe = 64, 32, 8
    path = os.path.join(workdir, f"ann_corpus_{n}.parquet")
    if not os.path.exists(path):
        t0 = time.perf_counter()
        gen_corpus(path, n)
        print(f"  generated {n} vectors in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    # One pyarrow file = one fat row group = a 1-task scan; spread it
    # like a real multi-file table before caching.
    corpus = spark.read.parquet(path).repartition(32).cache()
    assert corpus.count() == n
    qmod = max(997, n // 100)  # ~100 queries at every scale
    queries = corpus.filter(F.col("vec_id") % qmod == 0)
    n_q = queries.count()
    out: dict = {"n_vectors": n, "n_queries": n_q, "dim": dim}

    def timed(label, df):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[label] = round(best, 3)
        return df

    exact = timed("exact_matmul_sec", matmul_topk(
        corpus, collect_query_vectors(queries), k=10
    ))
    lsh = timed("lsh_48b6band_mp1_sec", hyperplane_lsh_topk(
        corpus, queries, k=10, n_bits=48, n_bands=6, dim=dim,
        probe_bits=1,
    ))
    t0 = time.perf_counter()
    ivf = ivf_topk(corpus, queries, k=10, nlist=nlist, nprobe=nprobe)
    out["ivf_fit_sec"] = round(time.perf_counter() - t0, 3)
    ivf = timed(f"ivf_{nlist}c{nprobe}p_query_sec", ivf)
    out["lsh_recall"] = round(recall_at_k(lsh, exact, k=10).first().recall, 4)
    out["ivf_recall"] = round(recall_at_k(ivf, exact, k=10).first().recall, 4)
    c = with_lsh_bands(corpus, n_bits=48, n_bands=6, dim=dim)
    q = with_lsh_bands(
        queries, n_bits=48, n_bands=6, dim=dim, probe_bits=1
    ).select(F.col("vec_id").alias("qid"), "band", "band_key")
    n_cand = (
        c.join(q, ["band", "band_key"]).select("qid", "vec_id")
        .distinct().count()
    )
    out["lsh_candidate_fraction"] = round(n_cand / (n_q * n), 4)
    out["ivf_scan_fraction"] = round(nprobe / nlist, 4)
    corpus.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[100_000, 1_000_000])
    ap.add_argument("--workdir", default="/root/repo/.localdata")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    from conversation_with_vector_db_spark.session import get_spark

    spark = get_spark(
        app_name="cvdb-ann-scale", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in args.n:
        print(json.dumps(run_scale(spark, n, args.workdir)))
    spark.stop()


if __name__ == "__main__":
    main()
