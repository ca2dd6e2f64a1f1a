"""Product quantization: vector search when the VECTORS don't fit.

IVF (operators/ann.py) bounds how much of the corpus a query READS;
PQ bounds how much the index WEIGHS. A 1536-d float64 embedding is
12 KB — 10^9 vectors is 12 TB of raw arrays; a PQ code with m
sub-quantizers is m bytes (m=96 -> 96 GB, a 128x compression). PQ
splits each vector into m contiguous subvectors, learns a
k<=256-centroid codebook per subspace on a deterministic sample
(Jegou, Douze, Schmid — "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the same public design FAISS implements), and
stores each vector as its m nearest-centroid ids.

Queries score with ASYMMETRIC DISTANCE COMPUTATION (ADC): the query
stays exact; per query ONE (m x k) table of
query-subvector . centroid inner products is built driver-side
(m*k*8 bytes — broadcast-tiny), and every corpus code scores as m
table LOOKUPS, no decompression and no per-pair float math. The scan
is Arrow-batched numpy `take`s — the PQ analogue of matmul_topk's
batch discipline.

Exactness discipline (matching this engine's sketch/bloom/band
operators): ADC ranks approximately, so `pq_topk` REFINES — the ADC
top-`refine` candidate ids join back to the raw vectors and the final
top-k is exact cosine over that candidate set. The code table prunes
the work; recall is certified by test and by the `ann_pq_recall_suite`
floor row, exactly like the LSH/IVF suites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pq_fit(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 256,
    sample_fraction: float | None = None,
    seed: int = 42,
    iters: int = 15,
):
    """Train per-subspace codebooks; returns a numpy array of shape
    (m, k, dsub). Deterministic: seeded sample, seeded init, fixed
    Lloyd iteration count — two fits of the same corpus are
    bit-identical (the same contract as the seeded IVF fit).

    Driver-side on a SAMPLE by design (FAISS trains PQ on ~10-100k
    points regardless of corpus size): the codebook is m*k*dsub
    floats; the training set is the only thing collected and
    ``sample_fraction`` bounds it. The dimension must divide by ``m``
    (loud refusal beats silent padding)."""
    import numpy as np

    # Hash-stratified sample, not df.sample: Bernoulli membership is
    # drawn from a per-partition RNG and would vary with the scan
    # layout; xxhash64(vector, seed) is a pure function of the data.
    # (The collected row ORDER is already layout-invariant: splits
    # collect in file-offset order whatever their size.)
    fit_on = (
        corpus
        if sample_fraction is None
        else corpus.where(
            F.pmod(
                F.xxhash64(F.col(vec_col), F.lit(seed)), F.lit(1_000_000)
            )
            < F.lit(int(sample_fraction * 1_000_000))
        )
    )
    # Drop NULL vectors and refuse ragged lengths LOUDLY: a None (or a
    # short row) in the collected list makes np.asarray build an
    # inhomogeneous object array whose error names numpy, not the
    # caller's data problem.
    rows = [
        r[0]
        for r in fit_on.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .collect()
    ]
    if not rows:
        raise ValueError("pq_fit: no non-NULL vectors to train on")
    dims = {len(v) for v in rows}
    if len(dims) != 1:
        raise ValueError(
            f"pq_fit: ragged vector lengths {sorted(dims)[:5]} — "
            "filter the corpus to a single dimension first"
        )
    vecs = np.asarray(rows, dtype=np.float64)
    n, dim = vecs.shape
    if dim % m != 0:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    dsub = dim // m
    k_eff = min(k, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m, k_eff, dsub), dtype=np.float64)
    for j in range(m):
        sub = vecs[:, j * dsub:(j + 1) * dsub]
        cent = sub[rng.choice(n, size=k_eff, replace=False)].copy()
        for _ in range(iters):
            # (n, k) squared distances via the expanded dot form.
            d2 = (
                (sub * sub).sum(1)[:, None]
                - 2.0 * sub @ cent.T
                + (cent * cent).sum(1)[None, :]
            )
            assign = d2.argmin(1)
            for c in range(k_eff):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(0)
                # empty cell: keep the old centroid (deterministic).
        books[j] = cent
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_cols: tuple[str, ...] = (),
    strict: bool = False,
) -> DataFrame:
    """(id, code array<int>[, keep_cols]) — each vector's per-subspace
    nearest centroid ids. One Arrow-batched pass; per batch the
    assignment is an (n, k) matmul per subspace, no Python per-row
    work. This is the table a 100 TB deployment PERSISTS
    (m bytes/vector) while the raw arrays stay cold in object storage
    for the refine reads. ``keep_cols`` ride through unchanged (e.g.
    the IVF cell tag, so IVF-PQ stores ONE code table partitioned by
    cell).

    MALFORMED-ROW CONTRACT (ADVICE r10): NULL/ragged vectors are
    SILENTLY DROPPED from the encoded index by default — the same
    size(q) == dim filter every quantized family applies, documented
    here because ``pq_fit`` raises loudly on the same input while the
    default encode path does not; corruption introduced between fit
    and encode therefore shrinks the index without a signal unless
    ``strict=True``, which counts the malformed rows (one cheap
    boolean aggregate) and raises a named error instead."""
    import numpy as np
    import pandas as pd

    from .cache import scoped_broadcast

    mm, k_eff, dsub = codebooks.shape
    # NULL/ragged vectors cannot be encoded (np.asarray would build an
    # inhomogeneous object array inside the Arrow batch) — exclude
    # them, the same malformed-row contract as the quantized families'
    # size(q) == dim filter.
    _ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == mm * dsub)
    if strict:
        n_bad = corpus.where(~F.coalesce(_ok, F.lit(False))).count()
        if n_bad:
            raise ValueError(
                f"pq_encode: {n_bad} NULL/ragged vector(s) (expected "
                f"dim {mm * dsub}) in a strict encode — the index "
                "would silently shrink; clean the corpus or encode "
                "with strict=False to drop them"
            )
    corpus = corpus.where(_ok)
    bc = scoped_broadcast(
        corpus.sparkSession.sparkContext.broadcast(codebooks)
    )

    def encode(batches):
        books = bc.value
        for pdf in batches:
            vecs = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if vecs.size == 0:
                continue
            codes = np.empty((len(vecs), mm), dtype=np.int32)
            for j in range(mm):
                sub = vecs[:, j * dsub:(j + 1) * dsub]
                cent = books[j]
                d2 = (
                    -2.0 * sub @ cent.T + (cent * cent).sum(1)[None, :]
                )  # (sub*sub).sum is constant per row: argmin-safe to drop
                codes[:, j] = d2.argmin(1)
            out = {id_col: pdf[id_col].values, "code": list(codes)}
            for c in keep_cols:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    keep_schema = "".join(
        f", {c} {corpus.schema[c].dataType.simpleString()}"
        for c in keep_cols
    )
    return corpus.select(id_col, vec_col, *keep_cols).mapInPandas(
        encode, f"{id_col} long, code array<int>{keep_schema}"
    )


def pq_adc_scores(
    codes: DataFrame,
    codebooks,
    query_vectors: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, id, ascore) — approximate inner-product scores via ADC
    lookup tables, for every (query, code) pair. The tables are
    (n_queries, m, k) floats built once driver-side from the exact
    query vectors; each Arrow batch scores with m vectorized `take`s
    per query — no decompression, no per-pair arithmetic."""
    import numpy as np
    import pandas as pd

    mm, k_eff, dsub = codebooks.shape
    qids = [q for q, _ in query_vectors]
    qmat = np.asarray([v for _, v in query_vectors], dtype=np.float64)
    # luts[q, j, c] = <query_q subvector j, centroid c of subspace j>
    luts = np.stack(
        [
            qmat[:, j * dsub:(j + 1) * dsub] @ codebooks[j].T
            for j in range(mm)
        ],
        axis=1,
    )
    from .cache import scoped_broadcast

    sess = codes.sparkSession
    bc = scoped_broadcast(sess.sparkContext.broadcast((qids, luts)))

    def score(batches):
        q_ids, tables = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.asarray(list(pdf["code"]), dtype=np.int64)
            n = len(cm)
            out_scores = np.zeros((len(q_ids), n), dtype=np.float64)
            for j in range(cm.shape[1]):
                out_scores += tables[:, j, :][:, cm[:, j]]
            ids = pdf[id_col].values
            yield pd.DataFrame(
                {
                    "qid": np.repeat(q_ids, n),
                    id_col: np.tile(ids, len(q_ids)),
                    "ascore": out_scores.reshape(-1),
                }
            )

    return codes.mapInPandas(
        score, f"qid long, {id_col} long, ascore double"
    )


def pq_topk(
    corpus: DataFrame,
    codes: DataFrame,
    codebooks,
    queries: DataFrame,
    k: int = 10,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine top-k over the ADC top-``refine`` candidate set:
    the compressed scan ranks, the refine join reads only
    ~refine raw vectors per query, and the output ordering is exact
    cosine (same shape/rounding as the other vector plans). Recall
    depends on (m, refine) and is floor-certified by the recall
    suite."""
    from .vector import collect_query_vectors, matmul_topk, topk_per_query

    qvecs = collect_query_vectors(queries, id_col, vec_col)
    cands = topk_per_query(
        pq_adc_scores(codes, codebooks, qvecs, id_col),
        refine,
        query_col="qid",
        score_col="ascore",
        tiebreak_col=id_col,
    ).select("qid", id_col)
    # Refine: exact cosine over candidates only. The per-query exact
    # rescore reuses matmul_topk against the candidate-pruned corpus;
    # the semi join is what a 100 TB serving path does to fetch raw
    # vectors for refinement (candidate ids are ~refine * n_queries).
    cand_ids = cands.select(id_col).distinct()
    pruned = corpus.join(F.broadcast(cand_ids), id_col)
    # The exact pass ranks over the UNION of all queries' candidates,
    # so its per-query window limit must admit every candidate (another
    # query's vector may outscore this query's own) — the join back to
    # `cands` then keeps only each query's own refine set.
    scored = matmul_topk(
        pruned, qvecs, k=max(k, refine) * max(1, len(qvecs)),
        id_col=id_col, vec_col=vec_col,
    ).join(cands, ["qid", id_col])
    return topk_per_query(
        scored.select("qid", id_col, "sim"), k,
        query_col="qid", score_col="sim", tiebreak_col=id_col,
    ).select("qid", id_col, "sim", "rank")


def pq_adc_pair_scores(
    pairs: DataFrame,
    codebooks,
    query_vectors: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, id, ascore) for an EXPLICIT (qid, id, code) pair table —
    the cell-pruned form of :func:`pq_adc_scores`: the caller joins
    codes to each query's probed cells first, so only probed pairs are
    ever scored. Batches hold mixed qids; the lookup stays fully
    vectorized via fancy indexing (qid -> table row, code -> column)."""
    import numpy as np
    import pandas as pd

    from .cache import scoped_broadcast

    mm, k_eff, dsub = codebooks.shape
    qids = np.asarray(sorted(q for q, _ in query_vectors), dtype=np.int64)
    by_id = dict(query_vectors)
    qmat = np.asarray([by_id[q] for q in qids], dtype=np.float64)
    luts = np.stack(
        [
            qmat[:, j * dsub:(j + 1) * dsub] @ codebooks[j].T
            for j in range(mm)
        ],
        axis=1,
    )
    bc = scoped_broadcast(
        pairs.sparkSession.sparkContext.broadcast((qids, luts))
    )

    has_bias = "_bias" in pairs.columns

    def score(batches):
        q_sorted, tables = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.asarray(list(pdf["code"]), dtype=np.int64)
            qi = np.searchsorted(
                q_sorted, pdf["qid"].to_numpy(dtype=np.int64)
            )
            acc = np.zeros(len(cm), dtype=np.float64)
            for j in range(cm.shape[1]):
                acc += tables[qi, j, cm[:, j]]
            if "_bias" in pdf.columns:
                # Residual encoding (IVFADC): score = q . coarse[cell]
                # + q . (residual reconstruction); the first term rides
                # in as a per-(qid, cell) column.
                acc += pdf["_bias"].to_numpy(dtype=np.float64)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].values,
                    id_col: pdf[id_col].values,
                    "ascore": acc,
                }
            )

    cols = ["qid", id_col, "code"] + (["_bias"] if has_bias else [])
    return pairs.select(*cols).mapInPandas(
        score, f"qid long, {id_col} long, ascore double"
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 32,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
    residual: bool = True,
) -> DataFrame:
    """IVF-PQ: the composed 100 TB serving architecture (the
    public FAISS IVFPQ design). IVF bounds what a query READS — only
    nprobe/nlist of the code table's cells join into the scan; PQ
    bounds what the index WEIGHS — the scanned cells are m-byte codes,
    not raw vectors; the exact-cosine refine touches raw vectors for
    only ~refine candidates per query. One code table partitioned by
    cell serves everything; the raw arrays stay cold until refine.

    ``residual=False`` encodes RAW vectors instead of cell residuals
    (pre-IVFADC form). It exists to MEASURE why residual is the
    default — see BENCH_ANN_1536D.json's pq A/B — not for serving."""
    from .ann import ivf_fit_cells, ivf_probed_cells
    from .vector import collect_query_vectors, matmul_topk, topk_per_query

    assigned, cent = ivf_fit_cells(
        corpus, nlist, vec_col, seed, fit_fraction
    )
    enc_src, enc_col = (
        (_with_residual(assigned, cent, vec_col), "_resid")
        if residual
        else (assigned, vec_col)
    )
    books = pq_fit(
        enc_src, enc_col, m=m, k=ksub, seed=seed,
        sample_fraction=fit_fraction,
    )
    codes = pq_encode(
        enc_src, books, enc_col, id_col, keep_cols=("cell",)
    )
    qvecs = collect_query_vectors(queries, id_col, vec_col)
    probed = ivf_probed_cells(cent, queries, nprobe, id_col, vec_col)
    probed = (
        probed.join(F.broadcast(cent), "cell").select(
            "qid", "cell",
            _dot(F.col("_qvec"), F.col("centroid")).alias("_bias"),
        )
        if residual
        else probed.select("qid", "cell")
    )
    pairs = codes.join(F.broadcast(probed), "cell")
    cands = topk_per_query(
        pq_adc_pair_scores(pairs, books, qvecs, id_col),
        refine,
        query_col="qid",
        score_col="ascore",
        tiebreak_col=id_col,
    ).select("qid", id_col)
    cand_ids = cands.select(id_col).distinct()
    pruned = corpus.join(F.broadcast(cand_ids), id_col)
    scored = matmul_topk(
        pruned, qvecs, k=max(k, refine) * max(1, len(qvecs)),
        id_col=id_col, vec_col=vec_col,
    ).join(cands, ["qid", id_col])
    return topk_per_query(
        scored.select("qid", id_col, "sim"), k,
        query_col="qid", score_col="sim", tiebreak_col=id_col,
    ).select("qid", id_col, "sim", "rank")


def _dot(a, b):
    """JVM-side dot product of two array columns (stays in codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _with_residual(assigned: DataFrame, cent: DataFrame, vec_col: str):
    """Attach ``_resid`` = vector - coarse centroid of its cell (the
    IVFADC residual; Jegou et al. 2011 §IV): residuals concentrate
    around zero at the intra-cell noise scale, so the PQ codebooks
    spend their resolution where the ranking signal lives. Raw-vector
    PQ on clustered data wastes codebook entries separating clusters
    the IVF probe already separated — measured A/B at 10^5 x 1536-d,
    m=96 (BENCH_ANN_1536D.json `pq_1536d`): recall@10 0.72 -> 0.856
    on the realistic low-intrinsic-dimension corpus (noise rank 64)
    and 0.22 -> 0.355 on full-rank isotropic noise (the PQ worst
    case: quantization error spread over every coordinate), at
    identical code size."""
    return assigned.join(F.broadcast(cent), "cell").withColumn(
        "_resid",
        F.zip_with(
            F.col(vec_col), F.col("centroid"), lambda a, b: a - b
        ),
    )


def pq_write_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    m: int = 8,
    ksub: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
) -> None:
    """Materialize an IVF-PQ index next to the raw vectors:

    * ``<path>/data/cell=<i>/``  — raw vectors, cell-partitioned (the
      :func:`..ann.ivf_write_index` layout; refine reads live here);
    * ``<path>/codes/cell=<i>/`` — the m-byte PQ codes of the CELL
      RESIDUALS (IVFADC; see :func:`_with_residual`), SAME
      partitioning (the scan path — ~dim*8/m times smaller);
    * ``<path>/centroids``       — the nlist-row IVF sidecar;
    * ``<path>/pq_books``        — (subspace, code, centroid) rows.

    Everything expensive (cell fit + assignment, codebook fit, encode)
    is paid once at write time; a query then partition-prunes the CODE
    table to nprobe cells, ADC-scans bytes, and touches the raw table
    only for ~refine candidate rows."""
    from .ann import ivf_fit_cells

    assigned, cent_df = ivf_fit_cells(
        corpus, nlist, vec_col, seed, fit_fraction
    )
    resid = _with_residual(assigned, cent_df, vec_col)
    books = pq_fit(
        resid, "_resid", m=m, k=ksub, seed=seed,
        sample_fraction=fit_fraction,
    )
    assigned.select(id_col, vec_col, "cell").write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(f"{path}/data")
    pq_encode(
        resid, books, "_resid", id_col, keep_cols=("cell",)
    ).write.partitionBy("cell").mode("overwrite").parquet(
        f"{path}/codes"
    )
    cent_df.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )
    mm, k_eff, dsub = books.shape
    rows = [
        (j, c, [float(x) for x in books[j, c]])
        for j in range(mm)
        for c in range(k_eff)
    ]
    corpus.sparkSession.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/pq_books")


def _load_books(spark, path: str):
    import numpy as np

    rows = spark.read.parquet(f"{path}/pq_books").collect()
    mm = 1 + max(r["subspace"] for r in rows)
    kk = 1 + max(r["code"] for r in rows)
    dsub = len(rows[0]["centroid"])
    books = np.zeros((mm, kk, dsub), dtype=np.float64)
    for r in rows:
        books[r["subspace"], r["code"]] = r["centroid"]
    return books


def pq_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a :func:`pq_write_index` layout: probed cells fold
    to PARTITION FILTERS on the CODE table (file listing prunes to
    nprobe/nlist of the m-byte-code files — the double win: fewer
    files AND ~dim*8/m smaller ones), qid-aware ADC scores the pruned
    pairs, and the exact refine reads raw vectors only from the probed
    cells' data partitions, semi-joined to the ~refine candidates per
    query. Same one-probe-evaluation discipline as ivf_topk_indexed:
    partition filter and pair join are rebuilt from ONE collected
    probe row set."""
    from .ann import ivf_probed_cells
    from .vector import matmul_topk, topk_per_query

    cent_df = spark.read.parquet(f"{index_path}/centroids")
    books = _load_books(spark, index_path)
    probed_rows = ivf_probed_cells(
        cent_df, queries, nprobe, id_col, vec_col
    ).collect()
    codes_scan = spark.read.parquet(f"{index_path}/codes")
    if not probed_rows:
        return (
            codes_scan.filter(F.lit(False))
            .select(
                F.col(id_col).alias("qid"),
                id_col,
                F.lit(0.0).alias("sim"),
                F.lit(0).alias("rank"),
            )
        )
    import numpy as np

    qvecs = sorted(
        (int(r["qid"]), [float(x) for x in r["_qvec"]])
        for r in probed_rows
    )
    qvecs = list(dict(qvecs).items())
    cells = sorted({int(r["cell"]) for r in probed_rows})
    coarse = {
        int(r["cell"]): np.asarray(r["centroid"], dtype=np.float64)
        for r in cent_df.collect()
    }
    qv_by_id = {q: np.asarray(v, dtype=np.float64) for q, v in qvecs}
    probed_df = F.broadcast(
        spark.createDataFrame(
            [
                (
                    int(r["qid"]),
                    int(r["cell"]),
                    # IVFADC bias: q . coarse[cell] — the codes are
                    # residual-encoded, so ADC scores add this back.
                    float(
                        qv_by_id[int(r["qid"])] @ coarse[int(r["cell"])]
                    ),
                )
                for r in probed_rows
            ],
            "qid long, cell int, _bias double",
        )
    )
    pairs = codes_scan.filter(F.col("cell").isin(cells)).join(
        probed_df, "cell"
    )
    cands = topk_per_query(
        pq_adc_pair_scores(pairs, books, qvecs, id_col),
        refine,
        query_col="qid",
        score_col="ascore",
        tiebreak_col=id_col,
    ).select("qid", id_col)
    cand_ids = cands.select(id_col).distinct()
    raw = spark.read.parquet(f"{index_path}/data").filter(
        F.col("cell").isin(cells)
    )
    pruned = raw.join(F.broadcast(cand_ids), id_col)
    scored = matmul_topk(
        pruned, qvecs, k=max(k, refine) * max(1, len(qvecs)),
        id_col=id_col, vec_col=vec_col,
    ).join(cands, ["qid", id_col])
    return topk_per_query(
        scored.select("qid", id_col, "sim"), k,
        query_col="qid", score_col="sim", tiebreak_col=id_col,
    ).select("qid", id_col, "sim", "rank")
