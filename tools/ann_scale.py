#!/usr/bin/env python3
"""ANN candidate economics at 10^5-10^6 vectors — the scale where
pruning is supposed to pay (bench's per-round `ann_economics` runs at
the sf-proportional 10^4-10^5, where brute force still wins; this tool
measures the claimed ~10^6 crossover instead of extrapolating it).

Same clustered distribution as the bench suite (20 well-separated
centroids, noise 0.08 — the realistic embedding shape), corpus
generated vectorized (numpy -> pyarrow ListArray in row-group chunks —
a 10^6-row createDataFrame would spend minutes serializing Python
lists, and a 1536-d corpus doesn't fit one in-memory pyarrow column).
Query count held at ~100 ACROSS scales so the numbers isolate
corpus-size scaling, not query-batch growth.

``--dim`` defaults to the reference's REAL embedding width, 1536
(text-embedding-ada-002 / 3-small: controllers/embeddingController.js:28,
controllers/conversationController.js:30) — per-pair cost is 24x the
64-d toy dimension, which moves the exact-vs-pruned crossover, the
KMeans fit cost, and the LSH bit budget; pass ``--dim 64`` to
reproduce the historical sweep.

Measures six strategies per scale: exact Arrow matmul, hyperplane
LSH (48b/6band/1-bit multi-probe), query-time IVF (fit+assign in the
plan), the write-time IVF index (`ivf_write_index` + partition-pruned
`ivf_topk_indexed`) including build cost and the probed-file fraction
actually read, the write-time IVF-PQ index (residual ADC codes +
refine, code-bytes fraction), and binary sign quantization (JVM
bit_count(xor) Hamming cut at several oversample factors).

Usage: python tools/ann_scale.py --n 100000 1000000 --dim 1536
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_corpus(path: str, n: int, dim: int, n_clusters: int = 20,
               noise_norm: float = 0.64, seed: int = 7,
               chunk: int = 50_000, noise_rank: int | None = None) -> None:
    """Chunked vectorized write: each chunk is one ListArray built from
    a flat buffer + offsets (no per-row Python lists), one row group.
    Peak memory is O(chunk * dim), not O(n * dim).

    ``noise_norm`` is the EXPECTED NORM of the per-point noise vector
    (not per-coordinate sigma): per-coordinate sigma is
    ``noise_norm/sqrt(dim)``, so cluster tightness — hence neighbor
    structure and ANN difficulty — is dimension-invariant. 0.64 equals
    the historical 64-d sweep's 0.08/coord; a fixed per-coordinate
    sigma at 1536-d would drown unit centroids in norm-3.2 noise and
    degenerate the corpus to near-uniform."""
    rng = np.random.default_rng(seed)
    noise = noise_norm / np.sqrt(dim)
    centroids = rng.normal(size=(n_clusters, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    # noise_rank restricts the per-point noise to a fixed r-dim
    # subspace of the ambient dim (same expected NORM): the
    # low-intrinsic-dimension structure real text embeddings have.
    # Full-rank isotropic noise (the default) is the PQ worst case —
    # quantization error is spread over every coordinate — so the two
    # settings bracket the realistic range.
    basis = None
    if noise_rank is not None and noise_rank < dim:
        basis, _ = np.linalg.qr(rng.normal(size=(dim, noise_rank)))
        noise = noise_norm / np.sqrt(noise_rank)
    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float64())),
    ])
    tmp = f"{path}.tmp-{os.getpid()}"
    with pq.ParquetWriter(tmp, schema, compression="zstd") as w:
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            m = hi - lo
            pt_noise = (
                rng.normal(size=(m, dim)) * noise
                if basis is None
                else (rng.normal(size=(m, basis.shape[1])) * noise)
                @ basis.T
            )
            vecs = (
                centroids[np.arange(lo, hi) * n_clusters // n]
                + pt_noise
            ).astype(np.float64)
            offsets = np.arange(0, (m + 1) * dim, dim, dtype=np.int64)
            emb = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(vecs.reshape(-1))
            )
            w.write_table(pa.table(
                {"vec_id": pa.array(range(lo, hi), pa.int64()),
                 "embedding": emb},
                schema=schema,
            ))
    # Atomic publish: a generator killed mid-write must leave no
    # half-footer file a later run would trust via os.path.exists.
    os.rename(tmp, path)


ALL_METHODS = ("exact", "lsh", "ivf", "ivf_indexed", "pq_indexed",
               "bq", "bq_indexed", "rp")


def _prepare_corpus(spark, n: int, dim: int, workdir: str,
                    noise_rank: int | None = None):
    """Generate (if absent), spread, and persist the clustered corpus;
    return (corpus, queries, n_q)."""
    from pyspark.sql import functions as F

    tag = f"_r{noise_rank}" if noise_rank else ""
    path = os.path.join(workdir, f"ann_corpus_{n}_{dim}d{tag}.parquet")
    if not os.path.exists(path):
        t0 = time.perf_counter()
        gen_corpus(path, n, dim, noise_rank=noise_rank)
        print(f"  generated {n} x {dim}-d vectors in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    # One pyarrow file scans as few fat partitions; spread it like a
    # real multi-file table before caching. Partition count scales
    # with corpus bytes (a 1536-d 10^6 corpus is ~12 GB raw; 32
    # partitions of it are ~370 MB each and OOM the single local JVM),
    # and a corpus past ~4 GB persists DISK_ONLY — deserialized
    # caching of a table that size in one JVM is the wrong trade.
    from pyspark import StorageLevel

    nbytes = os.path.getsize(path)
    nparts = max(32, int(nbytes / (64 << 20)))
    level = (
        StorageLevel.MEMORY_AND_DISK
        if nbytes < (4 << 30)
        else StorageLevel.DISK_ONLY
    )
    corpus = spark.read.parquet(path).repartition(nparts).persist(level)
    assert corpus.count() == n
    qmod = max(997, n // 100)  # ~100 queries at every scale
    queries = corpus.filter(F.col("vec_id") % qmod == 0)
    return corpus, queries, queries.count()


def run_scale(spark, n: int, dim: int, workdir: str, reps: int = 2,
              lsh_bits: int = 48, lsh_bands: int = 6,
              methods: tuple = ALL_METHODS,
              noise_rank: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from conversation_with_vector_db_spark.operators.ann import (
        hyperplane_lsh_topk,
        ivf_topk,
        ivf_topk_indexed,
        ivf_write_index,
        recall_at_k,
        with_lsh_bands,
    )
    from conversation_with_vector_db_spark.operators.vector import (
        collect_query_vectors,
        matmul_topk,
    )

    nlist, nprobe = 32, 8
    corpus, queries, n_q = _prepare_corpus(
        spark, n, dim, workdir, noise_rank
    )
    out: dict = {"n_vectors": n, "n_queries": n_q, "dim": dim}
    if noise_rank:
        out["noise_rank"] = noise_rank

    def timed(label, df):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[label] = round(best, 3)
        return df

    # The exact baseline always runs: it is the recall denominator.
    exact = timed("exact_matmul_sec", matmul_topk(
        corpus, collect_query_vectors(queries), k=10
    ))
    if "lsh" in methods:
        lsh = timed(f"lsh_{lsh_bits}b{lsh_bands}band_mp1_sec",
                    hyperplane_lsh_topk(
            corpus, queries, k=10, n_bits=lsh_bits, n_bands=lsh_bands,
            dim=dim, probe_bits=1,
        ))
        out["lsh_recall"] = round(
            recall_at_k(lsh, exact, k=10).first().recall, 4
        )
        c = with_lsh_bands(
            corpus, n_bits=lsh_bits, n_bands=lsh_bands, dim=dim
        )
        q = with_lsh_bands(
            queries, n_bits=lsh_bits, n_bands=lsh_bands, dim=dim,
            probe_bits=1,
        ).select(F.col("vec_id").alias("qid"), "band", "band_key")
        n_cand = (
            c.join(q, ["band", "band_key"]).select("qid", "vec_id")
            .distinct().count()
        )
        out["lsh_candidate_fraction"] = round(n_cand / (n_q * n), 4)
    # Centroid fit on a FAISS-style sample (~40 pts per cell) —
    # full-corpus KMeans at 10^6 x 1536-d is exactly the cost the
    # fit_fraction knob exists to avoid.
    fit_frac = min(1.0, (40.0 * nlist) / n)
    if "ivf" in methods:
        t0 = time.perf_counter()
        ivf = ivf_topk(corpus, queries, k=10, nlist=nlist,
                       nprobe=nprobe, fit_fraction=fit_frac)
        out["ivf_fit_sec"] = round(time.perf_counter() - t0, 3)
        ivf = timed(f"ivf_{nlist}c{nprobe}p_query_sec", ivf)
        out["ivf_recall"] = round(
            recall_at_k(ivf, exact, k=10).first().recall, 4
        )
        out["ivf_scan_fraction"] = round(nprobe / nlist, 4)
    if "ivf_indexed" in methods:
        # Write-time IVF index: build cost paid once, then the probe
        # is a partition-pruned scan — the documented 100 TB read path.
        idx_path = os.path.join(workdir, f"ann_ivfidx_{n}_{dim}d")
        shutil.rmtree(idx_path, ignore_errors=True)
        t0 = time.perf_counter()
        ivf_write_index(corpus, idx_path, nlist=nlist,
                        fit_fraction=fit_frac)
        out["ivf_index_build_sec"] = round(time.perf_counter() - t0, 3)
        ivfx = timed(f"ivf_indexed_{nlist}c{nprobe}p_query_sec",
                     ivf_topk_indexed(spark, idx_path, queries, k=10,
                                      nprobe=nprobe))
        out["ivf_indexed_recall"] = round(
            recall_at_k(ivfx, exact, k=10).first().recall, 4
        )
        # Probed-file fraction the indexed scan actually lists:
        # re-derive the probed cell set the same way the probe does.
        from conversation_with_vector_db_spark.operators.ann import (
            ivf_probed_cells,
        )
        all_files = glob.glob(f"{idx_path}/data/cell=*/*.parquet")
        cent = spark.read.parquet(f"{idx_path}/centroids")
        cells = {
            int(r["cell"])
            for r in ivf_probed_cells(
                cent, queries, nprobe=nprobe
            ).select("cell").distinct().collect()
        }
        probed_files = [
            f for f in all_files
            if int(os.path.basename(os.path.dirname(f)).split("=")[1])
            in cells
        ]
        out["ivf_indexed_file_fraction"] = round(
            len(probed_files) / max(1, len(all_files)), 4
        )
        shutil.rmtree(idx_path, ignore_errors=True)
    if "bq" in methods:
        # Binary sign quantization: the candidate stage reads ~dim/64
        # longs per row (1/32 of the raw bytes) and ranks by
        # bit_count(xor) entirely JVM-side; oversample trades the
        # refine cost for recall. Measured at several cuts to map the
        # recall/scan trade honestly.
        from conversation_with_vector_db_spark.operators.bq import (
            bq_topk,
        )

        for os_f in (8, 64):
            bqx = timed(
                f"bq_hamming_os{os_f}_query_sec",
                bq_topk(corpus, queries, k=10, dim=dim,
                        oversample=os_f),
            )
            out[f"bq_recall_os{os_f}"] = round(
                recall_at_k(bqx, exact, k=10).first().recall, 4
            )
    if "bq_indexed" in methods:
        # Write-time BQ layout: codes persisted next to the vectors,
        # so the Hamming scan reads ~dim/8 bytes per row and never
        # re-encodes (the in-plan encode dominates the "bq" method's
        # wall at scale).
        from conversation_with_vector_db_spark.operators.bq import (
            bq_topk_indexed,
            bq_write_index,
        )

        bq_path = os.path.join(workdir, f"ann_bqidx_{n}_{dim}d")
        shutil.rmtree(bq_path, ignore_errors=True)
        t0 = time.perf_counter()
        bq_write_index(corpus, bq_path, dim=dim)
        out["bq_index_build_sec"] = round(time.perf_counter() - t0, 3)

        def _bytes(sub):
            tot = 0
            for r, _d, fs in os.walk(f"{bq_path}/{sub}"):
                tot += sum(
                    os.path.getsize(os.path.join(r, f))
                    for f in fs if f.endswith(".parquet")
                )
            return tot

        out["bq_code_bytes_fraction"] = round(
            _bytes("codes") / max(1, _bytes("data")), 4
        )
        for os_f in (8, 64):
            bqi = timed(
                f"bq_indexed_os{os_f}_query_sec",
                bq_topk_indexed(spark, bq_path, queries, k=10,
                                oversample=os_f),
            )
            out[f"bq_indexed_recall_os{os_f}"] = round(
                recall_at_k(bqi, exact, k=10).first().recall, 4
            )
        shutil.rmtree(bq_path, ignore_errors=True)
    if "pq_indexed" in methods:
        # Write-time IVF-PQ: the probed cells' scan reads m-byte CODES
        # instead of dim*8-byte vectors; raw rows are touched only for
        # the ~refine candidates per query. m sized so dsub=16
        # (dim 1536 -> m=96 -> 768 B/vector incl. parquet framing vs
        # 12 KB raw).
        from conversation_with_vector_db_spark.operators.pq import (
            pq_topk_indexed,
            pq_write_index,
        )

        pq_m = max(8, dim // 16)
        pq_path = os.path.join(workdir, f"ann_pqidx_{n}_{dim}d")
        shutil.rmtree(pq_path, ignore_errors=True)
        t0 = time.perf_counter()
        # ~80 pts/centroid for the 256-centroid books (the FAISS
        # training regime); the collect stays ~20k rows at any n.
        pq_write_index(corpus, pq_path, nlist=nlist, m=pq_m, ksub=256,
                       fit_fraction=min(1.0, 20_000 / n))
        out["pq_index_build_sec"] = round(time.perf_counter() - t0, 3)

        def _bytes(sub):
            tot = 0
            for r, _d, fs in os.walk(f"{pq_path}/{sub}"):
                tot += sum(
                    os.path.getsize(os.path.join(r, f))
                    for f in fs if f.endswith(".parquet")
                )
            return tot

        out["pq_code_bytes_fraction"] = round(
            _bytes("codes") / max(1, _bytes("data")), 4
        )
        pqx = timed(f"pq_indexed_{nlist}c{nprobe}p_m{pq_m}_query_sec",
                    pq_topk_indexed(spark, pq_path, queries, k=10,
                                    nprobe=nprobe, refine=100))
        out["pq_indexed_recall"] = round(
            recall_at_k(pqx, exact, k=10).first().recall, 4
        )
        shutil.rmtree(pq_path, ignore_errors=True)
    if "rp" in methods:
        # Johnson-Lindenstrauss sketch: project to dim/12-ish, rank in
        # the sketch, exact-rescore the survivors. Zero fit state —
        # the candidate stage reads dim_out/dim of the exact scan.
        from conversation_with_vector_db_spark.operators.rp import (
            rp_topk_arrow,
        )

        rp_dim = max(32, dim // 12)
        for cand in (80, 400):
            rpx = timed(
                f"rp_{rp_dim}d_c{cand}_query_sec",
                rp_topk_arrow(corpus, queries, dim_in=dim,
                              dim_out=rp_dim, k=10, cand=cand),
            )
            out[f"rp_recall_{rp_dim}d_c{cand}"] = round(
                recall_at_k(rpx, exact, k=10).first().recall, 4
            )
    corpus.unpersist()
    return out


def run_nlist_sweep(spark, n: int, dim: int, workdir: str,
                    pairs: list[tuple[int, int]], reps: int = 2) -> dict:
    """nlist scaling for the write-time IVF index (VERDICT r6 #6): a
    10^8-vector index wants nlist ~ sqrt(n), so the fit/build/query
    cost curve past the historical nlist=32 must be measured, not
    extrapolated. One corpus, ONE exact baseline (shared recall
    denominator), then per distinct nlist: one index build (sampled
    KMeans fit at ~40 pts/cell), and per (nlist, nprobe) pair: the
    partition-pruned probe's min-of-reps wall, recall@10, and the
    fraction of index files the probed cells actually touch — the
    quantity that tracks nprobe/nlist and IS the 100 TB read bound."""
    from conversation_with_vector_db_spark.operators.ann import (
        ivf_probed_cells,
        ivf_topk_indexed,
        ivf_write_index,
        recall_at_k,
    )
    from conversation_with_vector_db_spark.operators.vector import (
        collect_query_vectors,
        matmul_topk,
    )

    corpus, queries, n_q = _prepare_corpus(spark, n, dim, workdir)
    out: dict = {
        "n_vectors": n, "n_queries": n_q, "dim": dim, "points": [],
    }
    exact = matmul_topk(corpus, collect_query_vectors(queries), k=10)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        exact.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out["exact_matmul_sec"] = round(best, 3)

    for nlist in sorted({nl for nl, _ in pairs}):
        idx_path = os.path.join(
            workdir, f"ann_ivfidx_{n}_{dim}d_nl{nlist}"
        )
        shutil.rmtree(idx_path, ignore_errors=True)
        fit_frac = min(1.0, (40.0 * nlist) / n)
        t0 = time.perf_counter()
        ivf_write_index(corpus, idx_path, nlist=nlist,
                        fit_fraction=fit_frac)
        build_sec = round(time.perf_counter() - t0, 3)
        all_files = glob.glob(f"{idx_path}/data/cell=*/*.parquet")
        cent = spark.read.parquet(f"{idx_path}/centroids")
        for nl, nprobe in pairs:
            if nl != nlist:
                continue
            probe = ivf_topk_indexed(spark, idx_path, queries, k=10,
                                     nprobe=nprobe)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                probe.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            cells = {
                int(r["cell"])
                for r in ivf_probed_cells(cent, queries, nprobe=nprobe)
                .select("cell").distinct().collect()
            }
            probed = [
                f for f in all_files
                if int(
                    os.path.basename(os.path.dirname(f)).split("=")[1]
                ) in cells
            ]
            point = {
                "nlist": nlist,
                "nprobe": nprobe,
                "index_build_sec": build_sec,
                "query_sec": round(best, 3),
                "recall": round(
                    recall_at_k(probe, exact, k=10).first().recall, 4
                ),
                "scan_fraction": round(nprobe / nlist, 4),
                "file_fraction": round(
                    len(probed) / max(1, len(all_files)), 4
                ),
            }
            out["points"].append(point)
            print(json.dumps(point), file=sys.stderr, flush=True)
        shutil.rmtree(idx_path, ignore_errors=True)
    corpus.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[100_000, 1_000_000])
    ap.add_argument("--dim", type=int, default=1536)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--lsh-bits", type=int, default=48)
    ap.add_argument("--lsh-bands", type=int, default=6)
    ap.add_argument("--workdir", default="/root/repo/.localdata")
    ap.add_argument("--keep-corpus", action="store_true")
    ap.add_argument(
        "--noise-rank", type=int, default=None,
        help="restrict per-point noise to an r-dim subspace (low "
        "intrinsic dimension, the realistic embedding shape); "
        "default full-rank isotropic = the PQ worst case",
    )
    ap.add_argument(
        "--methods", nargs="+", default=list(ALL_METHODS),
        choices=list(ALL_METHODS),
        help="strategies to measure (exact always runs: it is the "
        "recall denominator)",
    )
    ap.add_argument(
        "--sweep", default=None,
        help="nlist:nprobe pairs for the write-time-index nlist sweep, "
        "e.g. '32:8,128:16,128:32,512:32,512:64' — replaces the "
        "per-method run with run_nlist_sweep",
    )
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    from conversation_with_vector_db_spark.session import get_spark

    spark = get_spark(
        app_name="cvdb-ann-scale", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    pairs = (
        [tuple(map(int, p.split(":"))) for p in args.sweep.split(",")]
        if args.sweep
        else None
    )
    for n in args.n:
        if pairs:
            print(json.dumps(run_nlist_sweep(
                spark, n, args.dim, args.workdir, pairs,
                reps=args.reps,
            )), flush=True)
        else:
            print(json.dumps(run_scale(
                spark, n, args.dim, args.workdir, reps=args.reps,
                lsh_bits=args.lsh_bits, lsh_bands=args.lsh_bands,
                methods=tuple(args.methods),
                noise_rank=args.noise_rank,
            )), flush=True)
        if not args.keep_corpus:
            tag = f"_r{args.noise_rank}" if args.noise_rank else ""
            p = os.path.join(
                args.workdir,
                f"ann_corpus_{n}_{args.dim}d{tag}.parquet",
            )
            if os.path.exists(p):
                os.unlink(p)
    spark.stop()


if __name__ == "__main__":
    main()
