"""Vector similarity operators (SURVEY §2.3; reference read path
controllers/conversationController.js:32-45, Pinecone cosine ANN).

Scalar/occasional dot products use JVM-side ``zip_with`` + ``aggregate``
higher-order functions; BULK pair scoring uses the Arrow-batched
:func:`dot_batched` (vectorized numpy over whole batches, bit-identical
fold order — HOF lambdas are interpreted per element and lose by ~100x
on tens of thousands of pairs). Elements are cast to double before
multiply-accumulate to keep float32 rounding out of the similarity
ordering.

Scale design (100 TB corpus):
* The query side is tiny (one or a few vectors) -> ``broadcast``; the
  corpus is scanned once, no shuffle of raw vectors.
* Top-k uses a two-phase pattern: per-partition k via a window keyed by
  ``spark_partition_id()``, then global k over ``numPartitions * k``
  survivors — the shuffle carries k rows per partition instead of the
  whole scored corpus.
* Exact brute force is the correctness baseline; LSH bucketing
  (:mod:`.ann`) is the sublinear path, recall-checked against this.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_batched() -> "object":
    """Arrow-batched dot product UDF — the bulk-pair form of :func:`dot`.

    The HOF fold above is interpreted per element (~0.01 ms/pair at
    dim 64); when one plan rescores tens of thousands of candidate
    pairs that interpretation dominates the stage. This pandas UDF does
    the same multiply-accumulate over a whole Arrow batch, accumulating
    DIMENSION BY DIMENSION in float64 — the exact left-fold order (and
    the exact per-element double casts) of the SQL ``aggregate`` form,
    so the result is bit-identical to :func:`dot`, not merely close:
    oracle hash-parity is preserved through round().
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no parameter annotations: PEP 563 stringifies them, which
    # pandas_udf's signature inference rejects.
    @pandas_udf("double")
    def _dot(a, b):
        n = len(a)
        if n == 0:  # empty Arrow batch (empty partition)
            return pd.Series([], dtype="float64")
        an, bn = a.to_numpy(), b.to_numpy()
        # NULL/ragged rows yield NULL, exactly like the HOF fold
        # (zip_with null-pads -> aggregate propagates NULL). A pandas
        # UDF runs UNCONDITIONALLY even under a F.when guard (Spark
        # extracts it into its own ArrowEvalPython node), so the mask
        # must live here — np.stack on a None row would kill the
        # stage instead.
        valid = np.fromiter(
            (
                x is not None and y is not None and len(x) == len(y)
                for x, y in zip(an, bn)
            ),
            dtype=bool,
            count=n,
        )
        # Values and NULL-ness carried SEPARATELY (FloatingArray with
        # an explicit mask): assigning into a pandas nullable Float64
        # array coerces NaN to NA, which silently turned a genuine
        # NaN dot (inf-overflow fold: inf + -inf over FINITE inputs)
        # into SQL NULL and diverged from the HOF fold's NaN (r11,
        # caught by the dot_unrolled bit-identity pin). A nan INPUT
        # element still yields NULL: the Arrow boundary converts NULL
        # elements to nan (indistinguishable from a real NaN element),
        # so nan-in-input must mean NULL-element semantics here —
        # :func:`dot_unrolled` is the path with exact NaN-element
        # fidelity.
        vals = np.zeros(n, dtype=np.float64)
        mask = ~valid
        idx = np.flatnonzero(valid)
        if idx.size:
            lens = {len(an[i]) for i in idx}
            if len(lens) == 1:
                va = np.stack(an[idx]).astype(np.float64, copy=False)
                vb = np.stack(bn[idx]).astype(np.float64, copy=False)
                innan = np.isnan(va).any(axis=1) | np.isnan(vb).any(
                    axis=1
                )
                acc = np.zeros(va.shape[0], dtype=np.float64)
                for d in range(va.shape[1]):
                    acc += va[:, d] * vb[:, d]
                vals[idx] = acc
                mask[idx[innan]] = True
            else:
                # mixed dims across rows (valid per-row, un-stackable):
                # per-row left fold, same accumulation order
                for i in idx:
                    arr_a, arr_b = an[i], bn[i]
                    if np.isnan(arr_a).any() or np.isnan(arr_b).any():
                        mask[i] = True
                        continue
                    s = 0.0
                    for xd, yd in zip(arr_a, arr_b):
                        s += float(xd) * float(yd)
                    vals[i] = s
        return pd.Series(
            pd.arrays.FloatingArray(vals, mask), dtype="Float64"
        )

    return _dot


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product with the fold unrolled to a fixed ``dim`` — the
    zero-Python-boundary form of :func:`dot_batched` for plans that
    know the dimension at build time (r11, guide §4.1: prefer JVM
    codegen over any Python path).

    The expression is literally the fold's addition chain —
    ``((0.0 + t0) + t1) + ... + t_{dim-1}`` with
    ``t_i = get(a,i)::double * get(b,i)::double`` — so values are
    bit-identical to :func:`dot` / :func:`dot_batched` including the
    ``-0.0`` left-fold edge (``0.0 + -0.0 == +0.0``, exactly like the
    fold's zero seed). Whole-stage codegen compiles the chain to
    straight-line multiply-adds; the interpreted HOF loop and the
    Arrow round-trip (which ships every pair's BOTH vectors into a
    Python worker and back) both disappear.

    Rows where either array is NULL or not exactly ``dim`` long fall
    back to :func:`dot`, which reproduces the HOF NULL/ragged
    semantics (zip_with null-pads, the fold propagates NULL; two
    equal-but-short arrays still fold over their real elements).
    ``F.get`` (not ``[]``/``element_at``) keeps the guarded branch
    ANSI-safe — it returns NULL out of bounds instead of raising while
    the guard predicate is still being evaluated.
    """
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast(
            "double"
        )
    return F.when((F.size(a) == dim) & (F.size(b) == dim), acc).otherwise(
        dot(a, b)
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm (matches
    the convention of treating degenerate vectors as dissimilar)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine given precomputed L2 norms — one array fold per pair
    instead of three. Bit-identical to :func:`cosine_similarity` (same
    ``dot / (na * nb)`` expression over the same doubles), so oracle
    parity is unaffected; use it whenever a vector participates in many
    pairs (candidate rescoring, brute-force scans) so each norm is
    computed once per VECTOR, not once per PAIR."""
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def cosine_with_norms_batched(
    a: Column, b: Column, na: Column, nb: Column, dim: int | None = None
) -> Column:
    """:func:`cosine_with_norms` for bulk pair scoring — bit-identical
    values on every path. With ``dim`` (the plan knows its vector width
    at build time): the unrolled JVM chain (:func:`dot_unrolled`) —
    codegen multiply-adds, NO Python worker in the stage, and the
    pair-duplicated vectors never cross the JVM boundary (r11; at sf1
    the Arrow path shipped ~0.5 GB of duplicated arrays per execution
    of one rescore). Without ``dim``: the Arrow-batched numpy fold
    (:func:`dot_batched`), still ~100x the interpreted HOF."""
    d = dot_unrolled(a, b, dim) if dim is not None else dot_batched()(a, b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        d / (na * nb)
    )


#: Past this (on-disk parquet) size the vector table stops being
#: broadcast into candidate rescoring. Parquet double columns decode
#: ~2-4x larger in memory, so 64 MB on disk keeps the driver-side
#: broadcast comfortably under typical `maxResultSize`/executor-memory
#: budgets; above it the candidates shuffle instead — they are the
#: small side once the corpus is large.
RESCORE_BROADCAST_MAX_BYTES = 64 << 20


def rescore_candidates(
    cands: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vec_bytes: int | None = None,
    broadcast_max_bytes: int = RESCORE_BROADCAST_MAX_BYTES,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine over candidate (a, b) pairs, size-aware.

    Joins the pair list back to the vector table twice, precomputing
    each vector's norm once so per-pair work is a single Arrow-batched
    dot fold. The join strategy follows the vector-table size:

    * ``vec_bytes <= broadcast_max_bytes``: broadcast both vector
      sides — candidate pairs never shuffle.
    * larger or UNKNOWN (``vec_bytes=None``): shuffle-hash join on
      ``a`` / ``b`` — at 100 TB the vector table IS the big table and
      can never ship to every executor; the candidate list (already
      sub-quadratic after LSH banding) is the side that moves.
      Unknown defaults to the safe strategy: on object stores with no
      local path — exactly where tables are most likely huge — a
      missing size must not select broadcast.

    Output: (a, b, sim) with sim rounded to 4 digits (cross-engine
    ordering stability). ``dim`` (when the caller knows the vector
    width) selects the unrolled zero-Python scoring path — see
    :func:`cosine_with_norms_batched`.
    """
    ea = vectors.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("ea"),
        l2_norm(F.col(vec_col)).alias("na"),
    )
    eb = vectors.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("eb"),
        l2_norm(F.col(vec_col)).alias("nb"),
    )
    small = vec_bytes is not None and vec_bytes <= broadcast_max_bytes
    if small:
        joined = cands.join(F.broadcast(ea), "a").join(
            F.broadcast(eb), "b"
        )
    else:
        joined = cands.join(ea.hint("shuffle_hash"), "a").join(
            eb.hint("shuffle_hash"), "b"
        )
    return joined.select(
        "a",
        "b",
        F.round(
            cosine_with_norms_batched(
                F.col("ea"),
                F.col("eb"),
                F.col("na"),
                F.col("nb"),
                dim=dim,
            ),
            4,
        ).alias("sim"),
    )


def topk_per_query(
    scored: DataFrame,
    k: int,
    query_col: str = "qid",
    score_col: str = "sim",
    tiebreak_col: str = "vec_id",
) -> DataFrame:
    """Top-k rows per query from a scored DataFrame.

    A single ``row_number() OVER (PARTITION BY query)`` window plus a
    ``rank <= k`` filter: Spark's WindowGroupLimit rewrite (3.5+)
    inserts a *Partial* group-limit on the map side, so each map
    partition forwards at most k rows per query into the exchange —
    the shuffle carries ~P*k rows per query, not the scored corpus.
    That is exactly the hand-rolled two-phase top-k (per-partition k,
    then global k), but with one Exchange instead of two; the plan
    shape is pinned by ``tests/test_plan_shapes.py``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), tiebreak_col
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def collect_query_vectors(
    queries: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Driver-fold the (tiny by contract) query side into plain Python —
    the same constant-folding t5 applies to its single query vector.
    Happens at plan-build time, NOT per executed batch.

    NULL or ragged query vectors raise ``ValueError``: the query
    matrix needs uniform non-null rows, and a null query is a caller
    bug better surfaced at plan time than as a column of NULL sims
    (:func:`exact_topk` enforces the same on its JVM branch so
    behavior never flips on data size)."""
    rows = queries.select(id_col, vec_col).collect()
    if any(r[1] is None for r in rows):
        raise ValueError(
            "collect_query_vectors: NULL query embedding — filter or "
            "fix the query side before scoring"
        )
    dims = {len(r[1]) for r in rows}
    if len(dims) > 1:
        raise ValueError(
            f"collect_query_vectors: ragged query dimensions {dims} — "
            "the query matrix needs one uniform dimension"
        )
    return sorted(
        (int(r[0]), [float(x) for x in r[1]]) for r in rows
    )


def matmul_topk(
    corpus: DataFrame,
    query_vectors: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact cosine top-k with the scoring stage vectorized via
    ``mapInPandas``: each Arrow batch of corpus vectors is scored
    against the whole (driver-folded) query matrix with numpy.

    Same semantics as :func:`brute_force_topk`, different physics: the
    interpreted HOF fold costs ~6 us per pair, the batched form ~0.06 —
    at a 10^9-vector corpus that is the difference between a scan and a
    stall. Accumulation is dimension-by-dimension in float64 — the
    exact left-fold order (and per-element double casts) of the SQL
    ``aggregate`` form, so results are bit-identical to
    :func:`brute_force_topk`, not merely close (verified by test).

    ``extra_cols`` pass through the scoring stage unchanged (metadata
    columns a filtered search reports). Top-k still lowers to the
    WindowGroupLimit single-exchange shape via :func:`topk_per_query`.

    Quantization happens JVM-side with ``F.round`` on the raw float64
    the UDF emits — NOT ``np.round`` inside the batch: numpy rounds
    half-to-even on the binary value while Spark/DuckDB round
    HALF_UP on the decimal rendering, so a sim landing exactly on a
    4th-decimal tie (e.g. 0.03125) would diverge across engines and
    flip a driver-gate hash.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    if not query_vectors:
        raise ValueError(
            "matmul_topk: query_vectors is empty — callers should "
            "short-circuit the no-query case (V3 empty-result guard) "
            "rather than score against a 0-row query matrix"
        )
    qids = [q[0] for q in query_vectors]
    qmat = np.array([q[1] for q in query_vectors], dtype=np.float64)
    nq, dim = qmat.shape
    qn = np.zeros(nq)
    for d in range(dim):
        qn += qmat[:, d] * qmat[:, d]
    qn = np.sqrt(qn)

    in_fields = {f.name: f for f in corpus.schema.fields}
    schema = StructType(
        [
            StructField("qid", in_fields[id_col].dataType),
            in_fields[id_col],
            *[in_fields[c] for c in extra_cols],
            StructField("sim", DoubleType()),
        ]
    )

    def score(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            vecs = pdf[vec_col].to_numpy()
            # NULL or query-dim-mismatched corpus vectors score NULL —
            # exactly the JVM branch's zip_with/aggregate propagation
            # (they rank last under DESC NULLS LAST); np.stack on a
            # None row would kill the stage instead.
            valid = np.fromiter(
                (v is not None and len(v) == dim for v in vecs),
                dtype=bool,
                count=n,
            )
            idx = np.flatnonzero(valid)
            c = cn = None
            if idx.size:
                c = np.stack(
                    [np.asarray(vecs[i], dtype=np.float64) for i in idx]
                )
                # A NULL corpus ELEMENT arrives as nan at the Arrow
                # boundary; those rows must stay NULL like the JVM
                # fold's NULL propagation (see dot_batched).
                valid[idx[np.isnan(c).any(axis=1)]] = False
                cn = np.zeros(idx.size)
                for d in range(dim):
                    cn += c[:, d] * c[:, d]
                cn = np.sqrt(cn)
            for j in range(nq):
                # Values and NULL-ness separated (FloatingArray +
                # mask), like dot_batched: assigning into a nullable
                # Float64 coerces a genuine NaN sim (inf-overflow on
                # finite-normed vectors) to SQL NULL and diverges from
                # the JVM fold branch (r11).
                vals = np.zeros(n, dtype=np.float64)
                if idx.size:
                    acc = np.zeros(idx.size)
                    for d in range(dim):
                        acc += c[:, d] * qmat[j, d]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        vals[idx] = np.where(
                            (qn[j] == 0) | (cn == 0),
                            0.0,
                            acc / (qn[j] * cn),
                        )
                out = {"qid": qids[j], id_col: pdf[id_col]}
                for col in extra_cols:
                    out[col] = pdf[col]
                out["sim"] = pd.Series(
                    pd.arrays.FloatingArray(vals, ~valid),
                    dtype="Float64",
                )
                yield pd.DataFrame(out)

    scored = corpus.select(id_col, vec_col, *extra_cols).mapInPandas(
        score, schema
    )
    if round_digits is not None:
        scored = scored.withColumn(
            "sim", F.round("sim", round_digits)
        )
    return topk_per_query(scored, k, tiebreak_col=id_col)


#: Below this on-disk corpus size, exact top-k scores with the JVM HOF
#: fold: the Arrow path's fixed Python-worker round-trip exceeds what
#: batched numpy saves on a truly tiny corpus. Re-measured r4 against
#: WARM Python workers (the realistic session state — every pipeline
#: with any pandas-UDF stage has them running): the matmul overtakes
#: far earlier than r3's cold-worker A/B suggested — sf0.1, 2k x 64-d:
#: HOF 0.41 s vs matmul 0.29 s warm (1.8 s cold); sf1, 20k x 64-d:
#: 0.97 vs 0.59 s — so the gate drops 32 MB -> 512 KB and only
#: sub-MB corpora (unit fixtures, sf0.01's 190 KB) keep the
#: worker-free fold. UNKNOWN size picks the Arrow path — the safe
#: choice is the one that scales.
EXACT_TOPK_ARROW_MIN_BYTES = 512 << 10


def exact_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
    corpus_bytes: int | None = None,
    round_digits: int | None = 4,
) -> DataFrame:
    """Size-aware exact cosine top-k: :func:`brute_force_topk` (JVM
    interpreted fold, no Python round-trip) under
    :data:`EXACT_TOPK_ARROW_MIN_BYTES`, :func:`matmul_topk`
    (driver-folded query matrix x Arrow-batched numpy) above or when
    the size is unknown. The two paths are bit-identical (pinned by
    ``test_matmul_topk_bit_identical_to_brute_force``), so the gate is
    pure cost, never semantics — the same cost-on-input-size discipline
    as the rescore broadcast threshold and the AQE gate.

    ``corpus_bytes`` may be an UPPER BOUND on the scored corpus (e.g.
    the full table's on-disk size when ``corpus`` is a filtered subset,
    as in v1c): overestimates only bias toward the Arrow branch — the
    one that scales — never change results.

    Degenerate query sets raise ``ValueError`` on BOTH branches (the
    V3 empty-result guard is the caller's job): empty, NULL-vector, or
    ragged-dimension queries — the large branch raises from
    ``collect_query_vectors``/``matmul_topk``, and the small branch
    probes the (tiny by contract) query side explicitly. Without the
    probe the small branch would silently emit NULL-sim garbage ranks
    while the large branch raised, i.e. behavior flipping on data
    size, which the gate contract forbids. NULL or query-dim-
    mismatched CORPUS vectors score NULL sims on both branches (DESC
    NULLS LAST — they surface only when k exhausts real rows).
    The probe jobs run ONLY on the small branch, whose whole point is
    toy-scale cost — the large branch stays exactly as lazy as
    matmul_topk."""
    small = (
        corpus_bytes is not None
        and corpus_bytes < EXACT_TOPK_ARROW_MIN_BYTES
    )
    if small:
        qrows = queries.select(vec_col).collect()
        if not qrows:
            raise ValueError(
                "exact_topk: queries is empty — callers should "
                "short-circuit the no-query case (V3 empty-result "
                "guard) rather than score against a 0-row query set"
            )
        if any(r[0] is None for r in qrows):
            raise ValueError(
                "exact_topk: NULL query embedding — filter or fix the "
                "query side before scoring"
            )
        if len({len(r[0]) for r in qrows}) > 1:
            raise ValueError(
                "exact_topk: ragged query dimensions — the query side "
                "needs one uniform dimension"
            )
        out = brute_force_topk(
            corpus, queries, k, id_col, vec_col, round_digits
        )
    else:
        out = matmul_topk(
            corpus,
            collect_query_vectors(queries, id_col, vec_col),
            k,
            id_col,
            vec_col,
            extra_cols,
            round_digits,
        )
    return out.select("qid", id_col, *extra_cols, "sim", "rank")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors across the corpus
    scan (V1, topK=10 at controllers/conversationController.js:34).

    ``round_digits`` quantizes the similarity BEFORE ranking so the
    ordering is reproducible across engines/accumulation orders; ties
    break on the corpus id.
    """
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    # JVM fold, not dot_batched(): with a handful of broadcast query
    # vectors the Arrow transfer (query vector repeated per corpus row)
    # costs more than the interpreted fold saves — measured at sf0.1.
    c = corpus.withColumn("_cn", l2_norm(F.col(vec_col)))
    sim = cosine_with_norms(
        F.col("_qvec"), F.col(vec_col), F.col("_qn"), F.col("_cn")
    )
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", id_col, sim.alias("sim"),
        *[col for col in corpus.columns if col not in (id_col, vec_col)],
    )
    return topk_per_query(scored, k, tiebreak_col=id_col)
