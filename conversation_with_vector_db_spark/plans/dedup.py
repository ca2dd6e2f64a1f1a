"""Deduplication queries over the `corpus` fixture (documents + planted
duplicates) — exact, n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup.

These extend the reference (whose only dedup is key-wise upsert) with
the curation operators a 100 TB training corpus requires; every variant
except none is oracle-checked against DuckDB running the same md5-based
algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_P,
    exact_duplicate_groups,
    jaccard_pairs,
    jaccard_verify,
    minhash_lsh_candidates,
    minhash_perm_constants,
    simhash_near_pairs,
)
from ..operators.cache import scoped_cache
from .. import fixtures
from .registry import query
from .scale import _KMEANS_CTES, kmeans_ctes

# Shared DuckDB CTE: distinct word-3-gram shingle hashes per corpus doc
# (mirror of operators.dedup.exploded_shingles on the corpus view).
_SHINGLES_CTE = """
tok AS (
    SELECT doc_id,
           regexp_extract_all(
               regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'),
               '[a-z0-9]+') AS toks
    FROM corpus
),
sh0 AS (
    SELECT DISTINCT doc_id,
           CAST(('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')),
                 1, 15)) AS BIGINT) AS shingle
    FROM tok,
         unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS t(i)
),
sh AS (
    SELECT s.doc_id, s.shingle
    FROM sh0 s
    JOIN (SELECT shingle FROM sh0
          GROUP BY shingle HAVING count(*) <= 64) r USING (shingle)
)
"""

# Document-frequency cap shared by the Spark plans and the oracle CTE
# above: shingles in >64 docs are non-discriminative noise that
# quadratically inflates the inverted-index join.
MAX_DF = 64


def _docs_bytes(sf_dir: str) -> int | None:
    """On-disk size of the documents file — the corpus-size proxy the
    dedup cost gates key on (corpus = documents + ~33% plants)."""
    from ..session import table_path
    from ..sources.parquet_io import parquet_bytes_on_disk

    return parquet_bytes_on_disk(table_path(sf_dir, "documents"))


def _capped_shingle_index(
    spark: SparkSession, sf_dir: str | None
) -> DataFrame:
    """The dedup family's shared (doc_id, shingle) DF-capped index.

    Below the fused-cap size gate the CACHED object is the capped
    posting-list table (cap + postings in ONE groupBy — no count pass,
    no anti-join; A/B at sf0.1: index build 5.9 -> 2.5 s) and the pair
    view is a cheap explode over it; because every dedup query derives
    the identical plan, the generational cache (`scoped_cache`
    sameResult dedupe) shares ONE materialization across minhash /
    incremental / fuzzy-decontamination / Jaccard-verify consumers in
    a session. Above the gate — or when size is unknowable — the
    two-pass broadcast anti-join shape bounds reducer memory by
    ``MAX_DF`` (see `operators/dedup.FUSED_CAP_MAX_BYTES`).
    """
    sh, _, _ = _shared_dedup_index(spark, sf_dir)
    return sh


def _shared_dedup_index(
    spark: SparkSession, sf_dir: str | None
) -> tuple[DataFrame, DataFrame | None, DataFrame | None]:
    """(sh, lists, sig) — the dedup family's shared per-corpus index
    artifacts, every one generationally cached off the SAME postings
    plan so plan-identical derivations dedupe to one materialization:

    * ``sh``: the (doc_id, shingle) exploded view (both gate arms).
    * ``lists``: the forward index (doc_id, sorted shingle array, sz)
      — fused-gate arm only (``None`` above the gate, where per-doc
      arrays would be pointless to broadcast anyway).
    * ``sig``: the (doc_id, mh0..mh11) minhash signature table, a
      map-only derivation over ``lists`` — fused-gate arm only.

    At cluster scale all three are the persisted index tables an
    ingest pipeline maintains next to the corpus (inverted index,
    forward index, signature index); here the generational cache is
    their stand-in, exactly like the postings table before them.
    """
    from ..operators.dedup import (
        df_capped_shingles,
        doc_shingle_lists,
        exploded_shingles,
        fused_cap_applies,
        fused_capped_postings,
        minhash_signatures_from_lists,
    )

    corpus = spark.table("corpus")
    b = _docs_bytes(sf_dir) if sf_dir else None
    if fused_cap_applies(MAX_DF, b):
        postings = scoped_cache(
            fused_capped_postings(
                exploded_shingles(corpus), "doc_id", MAX_DF
            )
        )
        sh = postings.select(
            "shingle", F.explode("_ids").alias("doc_id")
        )
        lists = scoped_cache(doc_shingle_lists(postings))
        sig = scoped_cache(minhash_signatures_from_lists(lists))
        return sh, lists, sig
    return scoped_cache(df_capped_shingles(corpus, max_df=MAX_DF)), None, None


@query(
    "dedup_exact",
    # Local tier since the late-r8 rotation (s15/a20 in): the exact-
    # hash semantics are embedded in pipeline_training_manifest and
    # the family keeps 7 driver rows (char-ngram, clusters,
    # embedding-cosine, incremental, minhash, semdedup, substring).
    driver=False,
    doc="""Exact dedup: hash-groupBy on normalized content — one shuffle
    of (hash, id), canonical id = min. Finds the planted +500000000
    copies.""",
    fixtures_used=("corpus",),
    oracle="""
WITH hashes AS (
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))
               AS chash
    FROM corpus
)
SELECT chash, count(*) AS n_dups, min(doc_id) AS canonical_id
FROM hashes
GROUP BY chash
HAVING count(*) > 1
ORDER BY canonical_id
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        exact_duplicate_groups(spark.table("corpus"))
        .filter(F.col("n_dups") > 1)
        .orderBy("canonical_id")
    )


@query(
    "dedup_ngram_jaccard",
    # Local-parity only since r6: same inverted-index Jaccard family as
    # the driver-green dedup_char_ngram; demoted to hold the 50-cap
    # when ann_ivf_indexed_suite was promoted (VERDICT r5 #2).
    driver=False,
    doc="""N-gram Jaccard near-dup: inverted-index self-join on word
    3-gram hashes (docs only meet if they share a shingle — no
    all-pairs), |A∩B| from the join, threshold 0.5, DF cap 64. Catches
    the planted appended-tail / changed-head near-copies.""",
    fixtures_used=("corpus",),
    oracle="WITH "
    + _SHINGLES_CTE
    + """,
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
    FROM sh x JOIN sh y USING (shingle)
    WHERE x.doc_id < y.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT c.a AS a, c.b AS b,
           round(CAST(c.common AS DOUBLE)
                 / (sa.sz + sb.sz - c.common), 4) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.a
    JOIN sizes sb ON sb.doc_id = c.b
)
SELECT a, b, jaccard FROM pairs
WHERE jaccard >= 0.5
ORDER BY a, b
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Presentation sort dropped (r11): the gate hashes
    # order-insensitively and the ORDER BY cost a range exchange.
    return jaccard_pairs(
        spark.table("corpus"), threshold=0.5, max_df=MAX_DF,
        src_bytes=_docs_bytes(sf_dir),
    )


@query(
    "dedup_minhash_lsh",
    doc="""MinHash+LSH near-dup: 12 universal-hash permutations
    ((a*s+b) mod P over the 60-bit shingle hashes) -> min per
    doc (one explode+groupBy pass), 4 bands x 3 rows, candidates share
    a band key, then exact-Jaccard verification at 0.5 — candidate
    count scales with collisions, not pairs.""",
    fixtures_used=("corpus",),
    oracle="WITH "
    + _SHINGLES_CTE
    + f""",
perms AS (
    SELECT doc_id, p.i AS perm,
           (p.a * (shingle % {MINHASH_P}) + p.b) % {MINHASH_P} AS h
    FROM sh, (VALUES {", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(minhash_perm_constants(12))
    )}) AS p(i, a, b)
),
sig AS (
    SELECT doc_id, perm, min(h) AS minhash
    FROM perms GROUP BY doc_id, perm
),
bandkeys AS (
    SELECT doc_id, CAST(perm // 3 AS INT) AS band,
           md5(array_to_string(list_sort(list(minhash)), ',')) AS band_key
    FROM sig GROUP BY doc_id, band
),
cands AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bandkeys x JOIN bandkeys y USING (band, band_key)
    WHERE x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
    FROM sh x JOIN sh y USING (shingle)
    WHERE x.doc_id < y.doc_id
    GROUP BY 1, 2
)
SELECT c.a AS a, c.b AS b,
       round(CAST(m.common AS DOUBLE)
             / (sa.sz + sb.sz - m.common), 4) AS jaccard
FROM cands c
JOIN common m ON m.a = c.a AND m.b = c.b
JOIN sizes sa ON sa.doc_id = c.a
JOIN sizes sb ON sb.doc_id = c.b
WHERE round(CAST(m.common AS DOUBLE)
            / (sa.sz + sb.sz - m.common), 4) >= 0.5
ORDER BY a, b
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_verify_from_lists

    corpus = spark.table("corpus")
    # Shared per-corpus index artifacts (inverted index, forward index,
    # signature table — one materialization each per session). Under
    # the fused gate, signatures come from the CACHED map-only
    # derivation and verification is two forward-index broadcasts with
    # an inline array_intersect — the pre-r11 shape instead re-exploded
    # the posting table three times and rebuilt per-doc sizes twice on
    # every execution (see OPTIMIZATION_r11.md).
    sh, lists, sig = _shared_dedup_index(spark, sf_dir)
    cands = minhash_lsh_candidates(
        corpus, num_perm=12, bands=4, shingles=sh, signatures=sig
    )
    if lists is not None:
        return jaccard_verify_from_lists(cands, lists, threshold=0.5)
    return jaccard_verify(corpus, cands, threshold=0.5, shingles=sh)


@query(
    "dedup_minhash_estimate",
    driver=False,
    doc="""Sketch-estimated Jaccard vs exact, per LSH candidate pair:
    the estimator (fraction of agreeing minhash permutations) IS the
    verify step once exact verification is too expensive — at 100 TB
    the shingle sets are long gone and only the 12-column signature
    index survives, so this query reports what that regime actually
    computes, side by side with the exact value the fixture can still
    afford (est_jaccard, jaccard, abs_err). The estimate is one
    12-term integer comparison per pair over the already-built wide
    signature table — no shingle shuffle at all on the estimate
    path.""",
    fixtures_used=("corpus",),
    oracle="WITH "
    + _SHINGLES_CTE
    + f""",
perms AS (
    SELECT doc_id, p.i AS perm,
           (p.a * (shingle % {MINHASH_P}) + p.b) % {MINHASH_P} AS h
    FROM sh, (VALUES {", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(minhash_perm_constants(12))
    )}) AS p(i, a, b)
),
sig AS (
    SELECT doc_id, perm, min(h) AS minhash
    FROM perms GROUP BY doc_id, perm
),
bandkeys AS (
    SELECT doc_id, CAST(perm // 3 AS INT) AS band,
           md5(array_to_string(list_sort(list(minhash)), ',')) AS band_key
    FROM sig GROUP BY doc_id, band
),
cands AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bandkeys x JOIN bandkeys y USING (band, band_key)
    WHERE x.doc_id < y.doc_id
),
agree AS (
    SELECT c.a, c.b,
           sum(CASE WHEN sx.minhash = sy.minhash THEN 1 ELSE 0 END)
               AS n_agree
    FROM cands c
    JOIN sig sx ON sx.doc_id = c.a
    JOIN sig sy ON sy.doc_id = c.b AND sy.perm = sx.perm
    GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
    FROM sh x JOIN sh y USING (shingle)
    WHERE x.doc_id < y.doc_id
    GROUP BY 1, 2
)
SELECT g.a AS a, g.b AS b,
       round(g.n_agree / 12.0, 4) AS est_jaccard,
       round(CAST(COALESCE(m.common, 0) AS DOUBLE)
             / (sa.sz + sb.sz - COALESCE(m.common, 0)), 4) AS jaccard,
       round(abs(g.n_agree / 12.0
                 - CAST(COALESCE(m.common, 0) AS DOUBLE)
                   / (sa.sz + sb.sz - COALESCE(m.common, 0))), 4)
           AS abs_err
FROM agree g
LEFT JOIN common m ON m.a = g.a AND m.b = g.b
JOIN sizes sa ON sa.doc_id = g.a
JOIN sizes sb ON sb.doc_id = g.b
ORDER BY a, b
""",
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_signatures

    corpus = spark.table("corpus")
    sh, lists, sig = _shared_dedup_index(spark, sf_dir)
    if sig is None:
        sig = scoped_cache(minhash_signatures(corpus, shingles=sh))
    cands = minhash_lsh_candidates(
        corpus, num_perm=12, bands=4, shingles=sh, signatures=sig
    )
    sa = sig.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"mh{i}").alias(f"xa{i}") for i in range(12)],
    )
    sb = sig.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"mh{i}").alias(f"xb{i}") for i in range(12)],
    )
    n_agree = sum(
        (F.col(f"xa{i}") == F.col(f"xb{i}")).cast("int")
        for i in range(12)
    )
    est = (
        cands.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", n_agree.alias("n_agree"))
    )
    # Exact side for the error column, restricted to the CANDIDATE
    # pairs actually reported (the jaccard_verify shape — 'work scales
    # with candidates, not with every shingle-sharing pair'); the full
    # shingle self-join would pay the corpus-wide quadratic pair
    # explosion just to left-join 99% of it away.
    if lists is not None:
        # Forward-index arm: |A ∩ B| inline off two broadcast lookups
        # (array_intersect over duplicate-free arrays == the join's
        # per-pair row count — zero-overlap candidates get an exact 0
        # where the join arm's absent row coalesced to 0).
        la = lists.select(
            F.col("doc_id").alias("a"),
            F.col("_sh").alias("_sha"),
            F.col("sz").alias("sza"),
        )
        lb = lists.select(
            F.col("doc_id").alias("b"),
            F.col("_sh").alias("_shb"),
            F.col("sz").alias("szb"),
        )
        joined = est.join(F.broadcast(la), "a").join(F.broadcast(lb), "b")
        common_col = F.size(F.array_intersect("_sha", "_shb"))
        exact = common_col.cast("double") / (
            F.col("sza") + F.col("szb") - common_col
        )
        return joined.select(
            "a",
            "b",
            F.round(F.col("n_agree") / 12.0, 4).alias("est_jaccard"),
            F.round(exact, 4).alias("jaccard"),
            F.round(F.abs(F.col("n_agree") / 12.0 - exact), 4).alias(
                "abs_err"
            ),
        )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    x = sh.select(F.col("doc_id").alias("a"), "shingle")
    y = sh.select(F.col("doc_id").alias("b"), "shingle")
    common = (
        cands.join(x.hint("shuffle_hash"), "a")
        .join(y.hint("shuffle_hash"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    szb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    sza = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    exact = F.coalesce(F.col("common"), F.lit(0)).cast("double") / (
        F.col("sza") + F.col("szb") - F.coalesce(F.col("common"), F.lit(0))
    )
    return (
        est.join(common, ["a", "b"], "left")
        .join(sza, "a")
        .join(szb, "b")
        .select(
            "a",
            "b",
            F.round(F.col("n_agree") / 12.0, 4).alias("est_jaccard"),
            F.round(exact, 4).alias("jaccard"),
            F.round(F.abs(F.col("n_agree") / 12.0 - exact), 4).alias(
                "abs_err"
            ),
        )
    )


@query(
    "dedup_simhash",
    # Local-parity since the r8 semantic-dedup rotation: the near-dup
    # family keeps driver rows via minhash/char-ngram/embedding-cosine;
    # dedup_semantic_semdedup takes the slot.
    driver=False,
    doc="""SimHash near-dup: 60-bit weighted-majority hash per doc
    (linear passes only), banded 4x15-bit exact-match blocking
    (pigeonhole guarantees recall at hamming<=3), verify by
    popcount(xor).""",
    fixtures_used=("corpus",),
    oracle="""
WITH tok AS (
    SELECT doc_id,
           unnest(regexp_extract_all(
               regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'),
               '[a-z0-9]+')) AS token
    FROM corpus
),
tf AS (
    SELECT doc_id, token, count(*) AS tf,
           CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h
    FROM tok GROUP BY doc_id, token
),
votes AS (
    SELECT doc_id, b.bit AS bit,
           sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS v
    FROM tf, unnest(generate_series(0, 59)) AS b(bit)
    GROUP BY doc_id, b.bit
),
sh AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
),
bands AS (
    SELECT doc_id, simhash, b.band AS band,
           (simhash >> (b.band * 15)) & 32767 AS band_bits
    FROM sh, unnest(generate_series(0, 3)) AS b(band)
),
pairs AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
           x.simhash AS ha, y.simhash AS hb
    FROM bands x JOIN bands y USING (band, band_bits)
    WHERE x.doc_id < y.doc_id
)
SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM pairs
WHERE bit_count(xor(ha, hb)) <= 3
ORDER BY a, b
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Presentation sort dropped (r11): the gate hashes
    # order-insensitively and the ORDER BY cost a range exchange.
    return simhash_near_pairs(
        spark.table("corpus"), max_hamming=3
    ).withColumn("hamming", F.col("hamming").cast("int"))


@query(
    "dedup_embedding_cosine",
    driver=False,  # local parity since the r8 third-session rotation
    doc="""Embedding-cosine near-dup with sub-quadratic candidate
    generation: random-hyperplane LSH bands (48 bits / 6 bands,
    md5-seeded planes — deterministic, so the oracle reproduces them in
    SQL) block the corpus; only pairs sharing >=1 band key are exactly
    rescored, then the 30 most-similar candidate pairs are reported.
    8-bit bands lean toward precision — the right knob for NEAR-DUP
    (sim>=0.9) detection: random-pair collision ~2% even on a uniform
    corpus, while a sim-0.95 duplicate still collides with p~0.97.
    Never all-pairs: at 100 TB the band join is the candidate filter,
    exactly the shape of the minhash banding above.""",
    oracle="""
WITH planes AS (
    SELECT b.bit AS bit, d.d AS d,
           CAST(('0x' || substr(md5(42 || ':' || b.bit || ':' || d.d),
                 1, 8)) AS BIGINT) / 2147483647.0 - 1.0 AS w
    FROM unnest(generate_series(0, 47)) AS b(bit),
         unnest(generate_series(0, 63)) AS d(d)
),
proj AS (
    SELECT e.vec_id, p.bit,
           sum(e.embedding[p.d + 1]::DOUBLE * p.w) AS proj
    FROM embeddings e, planes p
    GROUP BY 1, 2
),
bands AS (
    SELECT vec_id, CAST(bit // 8 AS INT) AS band,
           string_agg(CASE WHEN proj > 0 THEN '1' ELSE '0' END, ''
                      ORDER BY bit) AS band_key
    FROM proj GROUP BY vec_id, CAST(bit // 8 AS INT)
),
cands AS (
    SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
    FROM bands x JOIN bands y USING (band, band_key)
    WHERE x.vec_id < y.vec_id
),
scored AS (
    SELECT c.a AS a, c.b AS b,
           round(CASE WHEN list_inner_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]) = 0
                 OR list_inner_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]) = 0 THEN 0.0
            ELSE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) END, 4) + 0 AS sim
    FROM cands c
    JOIN embeddings ea ON ea.vec_id = c.a
    JOIN embeddings eb ON eb.vec_id = c.b
)
SELECT a, b, sim,
       row_number() OVER (ORDER BY sim DESC, a, b) AS rank
FROM scored
ORDER BY sim DESC, a, b
LIMIT 30
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ann import with_lsh_bands

    emb = spark.table("embeddings")
    # Cache the banded signature table: it feeds BOTH sides of the
    # candidate self-join, and the 48-plane signature projection is the
    # per-row-expensive part (at cluster scale this persist is a
    # write-once signature index next to the vector table).
    banded = scoped_cache(
        with_lsh_bands(
            emb.select("vec_id", "embedding"), n_bits=48, n_bands=6, dim=64
        )
    )
    x = banded.select(
        F.col("vec_id").alias("a"), "band", "band_key"
    )
    y = banded.select(
        F.col("vec_id").alias("b"), "band", "band_key"
    )
    cands = (
        x.join(y.hint("shuffle_hash"), ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # Size-aware rescore join: the fixture vector table is MBs, so the
    # on-disk estimate keeps it broadcast (pairs never shuffle); past
    # the byte threshold — or when the size is unknowable — the vector
    # table IS (or may be) the big table and both lookups flip to
    # shuffle-hash joins on a/b instead: a 100 TB embedding table can
    # never ship to every executor.
    from ..operators.vector import rescore_candidates
    from ..session import table_path
    from ..sources.parquet_io import parquet_bytes_on_disk

    vec_bytes = parquet_bytes_on_disk(table_path(sf_dir, "embeddings"))
    # dim is already a plan-time constant here (the banding above is
    # built for 64-wide vectors), so the rescore takes the unrolled
    # zero-Python scoring path (r11): no ArrowEvalPython stage, no
    # pair-duplicated vectors crossing the JVM boundary.
    scored = rescore_candidates(cands, emb, vec_bytes=vec_bytes, dim=64)
    # Two-phase top-k (TakeOrderedAndProject), then rank the 30
    # survivors — no corpus-sized single-partition window.
    return (
        scored.orderBy(F.desc("sim"), "a", "b")
        .limit(30)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("sim"), "a", "b")),
        )
    )


@query(
    "dedup_char_ngram",
    doc="""Character 5-gram Jaccard near-dup — the char-level variant
    (robust to tokenization differences); same inverted-index shape as
    the word-level operator; the raw 5-char window IS the join key (at
    5 bytes it is already smaller than any portable hash of it, and
    skipping md5 removes ~300 hash evaluations per KB of text from the
    scan stage), sampled every 3rd offset to bound the index size
    (deterministic stride, mirrored in the oracle). DF cap 64 drops
    non-discriminative shingles (' the ' class) whose per-shingle pair
    fan-out is quadratic in document frequency — the same guard the
    word-gram twin uses.""",
    fixtures_used=("corpus",),
    oracle="""
WITH norm AS (
    SELECT doc_id,
           regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g') AS ntext
    FROM corpus
),
sh0 AS (
    SELECT DISTINCT doc_id,
           substring(ntext, CAST(i AS INT), 5) AS shingle
    FROM norm,
         unnest(generate_series(
             1, greatest(length(ntext) - 4, 1), 3)) AS t(i)
),
sh AS (
    SELECT s.doc_id, s.shingle
    FROM sh0 s
    JOIN (SELECT shingle FROM sh0
          GROUP BY shingle HAVING count(*) <= 64) r USING (shingle)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
    FROM sh x JOIN sh y USING (shingle)
    WHERE x.doc_id < y.doc_id
    GROUP BY 1, 2
)
SELECT c.a AS a, c.b AS b,
       round(CAST(c.common AS DOUBLE)
             / (sa.sz + sb.sz - c.common), 4) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.a
JOIN sizes sb ON sb.doc_id = c.b
WHERE round(CAST(c.common AS DOUBLE)
            / (sa.sz + sb.sz - c.common), 4) >= 0.6
ORDER BY a, b
""",
)
def dedup_char_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import char_window_shingles, normalized_text

    norm = spark.table("corpus").select(
        "doc_id", normalized_text(F.col("text")).alias("ntext")
    )
    # Byte-sliced ASCII fast path + char-correct fallback, both as
    # BINARY keys — see operators.dedup.char_window_shingles. The
    # size-gated cap/pairing (fused postings below the bound, two-pass
    # anti-join above — operators.dedup.fused_cap_applies) is the SAME
    # code path as the word-gram family: jaccard_pairs with the char
    # windows plugged in as the pre-built shingle table.
    sh0 = char_window_shingles(norm, "ntext", "doc_id", n=5, stride=3)
    # Presentation sort dropped (r11): the gate hashes
    # order-insensitively and the ORDER BY cost a range exchange.
    return jaccard_pairs(
        norm,
        threshold=0.6,
        max_df=MAX_DF,
        src_bytes=_docs_bytes(sf_dir),
        shingles0=sh0,
    )


# Shared by the exact and bloom-prefiltered decontamination queries —
# the bloom pass is a prefilter followed by the exact verify join, so
# both compute the identical relation.
_DECON_ORACLE = """
WITH btok AS (
    SELECT doc_id,
           regexp_extract_all(
               regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'),
               '[a-z0-9]+') AS toks
    FROM documents WHERE doc_id % 53 = 0
),
bsh AS (
    SELECT DISTINCT doc_id AS bench_id,
           CAST(('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')),
                 1, 15)) AS BIGINT) AS shingle
    FROM btok,
         unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS t(i)
),
ttok AS (
    SELECT doc_id,
           regexp_extract_all(
               regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'),
               '[a-z0-9]+') AS toks
    FROM corpus WHERE doc_id % 53 <> 0
),
tsh AS (
    SELECT DISTINCT doc_id AS train_id,
           CAST(('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')),
                 1, 15)) AS BIGINT) AS shingle
    FROM ttok,
         unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS t(i)
)
SELECT t.train_id AS train_id, b.bench_id AS bench_id,
       count(*) AS n_shared
FROM tsh t JOIN bsh b USING (shingle)
GROUP BY 1, 2
HAVING count(*) >= 5
ORDER BY train_id, bench_id
"""


def _decon_shingle_sides(
    spark: SparkSession,
) -> tuple[DataFrame, DataFrame]:
    """(bench shingles, train shingles) for the decontamination sweep:
    eval set = the deterministic ~2% slice doc_id % 53 = 0 of
    `documents`; training corpus = everything else in `corpus` (which
    contains planted near-copies of eval docs — the known
    contaminations)."""
    from ..operators.dedup import exploded_shingles

    bench = spark.table("documents").filter(F.col("doc_id") % 53 == 0)
    train = spark.table("corpus").filter(F.col("doc_id") % 53 != 0)
    bsh = exploded_shingles(bench).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    tsh = exploded_shingles(train).select(
        F.col("doc_id").alias("train_id"), "shingle"
    )
    return bsh, tsh


@query(
    "dedup_decontaminate",
    # Local tier since r4: the decontamination family keeps bloom +
    # incremental driver representatives; the slot funds promoting the
    # composed end-to-end pipeline below (VERDICT r3 #5).
    driver=False,
    doc="""Benchmark decontamination — the GPT-3/Pile-style n-gram
    overlap sweep a training pipeline runs before every release: flag
    training documents sharing >= 5 word-3-gram shingles with any doc
    of a held-out eval set (here the deterministic ~2% slice
    doc_id % 53 = 0 of `documents`; planted near-copies in `corpus`
    are the known contaminations). The eval side is tiny by nature
    (benchmarks are MBs against a 100 TB corpus), so its shingle set
    BROADCASTS and contamination detection is one map-side join over
    the training shingle index — the corpus is scanned once and never
    shuffled.""",
    fixtures_used=("corpus",),
    oracle=_DECON_ORACLE,
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    bsh, tsh = _decon_shingle_sides(spark)
    return (
        tsh.join(F.broadcast(bsh), "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
        .orderBy("train_id", "bench_id")
    )


@query(
    "dedup_decontaminate_bloom",
    driver=False,
    doc="""Bloom-prefiltered decontamination — the same relation as
    `dedup_decontaminate` (same oracle), computed the way it must be
    once the eval set outgrows an exact broadcast hash side: a Bloom
    filter over the eval shingles (16 bits/key, k=6, FPR <~1e-3 —
    operators.dedup.build_bloom) ships to executors as a ~bits/8-byte
    broadcast and prunes the corpus shingle stream map-side with
    vectorized bit probes; only probable hits (true matches + <~1e-3
    false positives) reach the exact verify join, which removes the
    false positives — results are exactly correct regardless of FPR
    (equivalence pinned by test). At 10^7+ eval shingles the exact
    8-byte-key broadcast set plus JVM hash-table overhead stops
    fitting, while the bloom stays ~20 MB. Consistently, the verify
    join is a SHUFFLE-hash join (not broadcast — that would rebuild
    the very eval-side hash table the bloom exists to avoid): the
    bloom-pruned stream is tiny (true matches + FPR of the corpus), so
    partitioning both sides on the shingle key is cheap at any
    scale.""",
    fixtures_used=("corpus",),
    oracle=_DECON_ORACLE,
)
def dedup_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import (
        bloom_might_contain,
        build_bloom_distributed,
    )

    bsh, tsh = _decon_shingle_sides(spark)
    # Executor-side bloom build (VERDICT r7 What's-wrong #3): the
    # driver never sees raw eval shingles — Spark aggregates the
    # OR-packed 32 KB bit-array chunks and the driver only stitches
    # those, so even a 10^7-shingle eval set costs the driver ~20 MB
    # of packed words, not ~80 MB of Python ints.
    words, k = build_bloom_distributed(bsh, "shingle")
    probe = bloom_might_contain(spark, words, k)
    return (
        tsh.filter(probe(F.col("shingle")))
        .join(bsh.hint("shuffle_hash"), "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
        .orderBy("train_id", "bench_id")
    )


@query(
    "dedup_decontaminate_fuzzy",
    driver=False,
    doc="""Fuzzy benchmark decontamination — the NEAR-duplicate form of
    the eval-overlap sweep: the exact variant's >= 5-shared-shingle
    rule misses paraphrased or lightly-edited benchmark leaks whose
    absolute overlap is small relative to document size, so this pass
    flags any training document whose word-3-gram JACCARD against an
    eval doc reaches 0.5, using the SAME minhash band index every
    other near-dup query shares (generationally cached / a persisted
    table at cluster scale). Directional like the ingest check: eval
    band keys probe the corpus index, candidates verify against exact
    shingle sets — the eval side is benchmark-sized, so the band join
    is eval-sized on one side and the corpus never self-pairs. Output:
    every (train doc, eval doc) pair at or above the threshold.""",
    fixtures_used=("corpus",),
    oracle="WITH "
    + _SHINGLES_CTE
    + f""",
perms AS (
    SELECT doc_id, p.i AS perm,
           (p.a * (shingle % {MINHASH_P}) + p.b) % {MINHASH_P} AS h
    FROM sh, (VALUES {", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(minhash_perm_constants(12))
    )}) AS p(i, a, b)
),
sig AS (
    SELECT doc_id, perm, min(h) AS minhash
    FROM perms GROUP BY doc_id, perm
),
bandkeys AS (
    SELECT doc_id, CAST(perm // 3 AS INT) AS band,
           md5(array_to_string(list_sort(list(minhash)), ',')) AS band_key
    FROM sig GROUP BY doc_id, band
),
cands AS (
    SELECT DISTINCT x.doc_id AS bench_id, y.doc_id AS train_id
    FROM bandkeys x JOIN bandkeys y USING (band, band_key)
    WHERE x.doc_id % 53 = 0 AND x.doc_id < 500000000
      AND y.doc_id % 53 <> 0
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
    SELECT c.train_id AS train_id, c.bench_id AS bench_id,
           count(*) AS common
    FROM cands c
    JOIN sh x ON x.doc_id = c.bench_id
    JOIN sh y ON y.doc_id = c.train_id AND y.shingle = x.shingle
    GROUP BY 1, 2
)
SELECT m.train_id AS train_id, m.bench_id AS bench_id,
       round(CAST(m.common AS DOUBLE)
             / (sa.sz + sb.sz - m.common), 4) AS jaccard
FROM common m
JOIN sizes sa ON sa.doc_id = m.bench_id
JOIN sizes sb ON sb.doc_id = m.train_id
WHERE round(CAST(m.common AS DOUBLE)
            / (sa.sz + sb.sz - m.common), 4) >= 0.5
ORDER BY train_id, bench_id
""",
)
def dedup_decontaminate_fuzzy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.dedup import (
        jaccard_verify,
        jaccard_verify_from_lists,
        lsh_band_keys,
        minhash_signatures,
    )

    corpus = spark.table("corpus")
    # Identical derivation (and scoped caches) to dedup_minhash_lsh /
    # dedup_incremental_minhash: the shared signature index is the
    # point — decontamination rides the index the dedup passes already
    # maintain.
    sh, lists, sig = _shared_dedup_index(spark, sf_dir)
    if sig is None:
        sig = minhash_signatures(corpus, num_perm=12, shingles=sh)
    keys = lsh_band_keys(sig)
    bench = keys.filter(
        (F.col("doc_id") % 53 == 0) & (F.col("doc_id") < 500000000)
    ).select(F.col("doc_id").alias("a"), "band", "band_key")
    train = keys.filter(F.col("doc_id") % 53 != 0).select(
        F.col("doc_id").alias("b"), "band", "band_key"
    )
    cands = (
        bench.join(train.hint("shuffle_hash"), ["band", "band_key"])
        .select("a", "b")
        .distinct()
    )
    verified = (
        jaccard_verify_from_lists(cands, lists, threshold=0.5)
        if lists is not None
        else jaccard_verify(corpus, cands, threshold=0.5, shingles=sh)
    )
    return verified.select(
        F.col("b").alias("train_id"),
        F.col("a").alias("bench_id"),
        "jaccard",
    ).orderBy("train_id", "bench_id")


# Recursive transitive-closure CTEs shared by the clustering queries:
# near-dup pairs (word-3-gram Jaccard >= 0.5) -> undirected edges ->
# WITH RECURSIVE reachability -> per-doc canonical (min reachable id).
# The corpus CTE is inlined (RECURSIVE cannot pass the fixture CTE
# merge), so consumers are registered WITHOUT fixtures_used and call
# fixtures.register_derived_views themselves.
_CLOSURE_CTES = f"""
WITH RECURSIVE corpus AS ({fixtures.CORPUS_SQL}),
{_SHINGLES_CTE.lstrip()},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
    FROM sh x JOIN sh y USING (shingle)
    WHERE x.doc_id < y.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT c.a AS a, c.b AS b
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.a
    JOIN sizes sb ON sb.doc_id = c.b
    WHERE round(CAST(c.common AS DOUBLE)
                / (sa.sz + sb.sz - c.common), 4) >= 0.5
),
und AS (
    SELECT a AS src, b AS dst FROM pairs
    UNION ALL
    SELECT b AS src, a AS dst FROM pairs
),
reach AS (
    SELECT src, dst FROM und
    UNION
    SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst
),
canon AS (
    SELECT src AS doc_id, least(src, min(dst)) AS canonical_id
    FROM reach GROUP BY src
)
"""


@query(
    "dedup_clusters",
    doc="""Duplicate clustering: connected components over the near-dup
    pair graph (word-3-gram Jaccard >= 0.5), assigning every clustered
    doc its component's min doc_id as the canonical copy to keep — the
    final 'drop all but one' step of a dedup pipeline. Spark side runs
    iterative min-label propagation (each round one join + groupBy,
    driver-coordinated loop, converges in graph-diameter rounds — the
    Pregel-lite idiom for iterative algorithms on DataFrames); the
    oracle computes the same components with a genuine WITH RECURSIVE
    transitive closure. Fixture CTEs are inlined because RECURSIVE
    cannot pass through the fixture CTE merge.""",
    oracle=_CLOSURE_CTES
    + """
SELECT c.doc_id AS doc_id, c.canonical_id AS canonical_id,
       CAST(s.n AS BIGINT) AS cluster_size
FROM canon c
JOIN (SELECT canonical_id, count(*) AS n
      FROM canon GROUP BY canonical_id) s USING (canonical_id)
ORDER BY doc_id
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    # Registered here, not via fixtures_used: the oracle inlines the
    # corpus CTE itself (WITH RECURSIVE cannot pass the CTE merge).
    fixtures.register_derived_views(spark)
    pairs = jaccard_pairs(
        spark.table("corpus"), threshold=0.5, max_df=MAX_DF,
        src_bytes=_docs_bytes(sf_dir),
    ).select("a", "b")
    lbl = connected_components(pairs)
    sizes = lbl.groupBy("lbl").agg(F.count("*").alias("cluster_size"))
    return (
        lbl.join(sizes, "lbl")
        .select(
            F.col("id").alias("doc_id"),
            F.col("lbl").alias("canonical_id"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )


# Keep-longest policy CTEs shared by dedup_keep_best and the training
# manifest: per-doc normalized-length quality + the per-cluster
# (quality DESC, doc_id) ranking over the closure's `canon`. Appended
# after _CLOSURE_CTES.
_QUAL_RANKED_CTES = """,
qual AS (
    SELECT doc_id,
           CAST(length(regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ',
                'g')) AS BIGINT) AS quality
    FROM corpus
),
ranked AS (
    SELECT m.doc_id, m.canonical_id, q.quality,
           row_number() OVER (PARTITION BY m.canonical_id
                              ORDER BY q.quality DESC, m.doc_id) AS rn
    FROM canon m JOIN qual q USING (doc_id)
)
"""


def _quality_ranked(
    spark: SparkSession, sf_dir: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Spark twin of :data:`_QUAL_RANKED_CTES`: (qual, ranked) where
    qual = (doc_id, quality) over the whole corpus and ranked adds the
    per-cluster keep rank for clustered docs. One definition so the
    keep policy can never diverge between the operator and the
    composed pipeline."""
    from ..operators.dedup import connected_components, normalized_text

    fixtures.register_derived_views(spark)
    corpus = spark.table("corpus")
    qual = corpus.select(
        "doc_id",
        F.length(normalized_text(F.col("text")))
        .cast("bigint")
        .alias("quality"),
    )
    pairs = jaccard_pairs(
        corpus, threshold=0.5, max_df=MAX_DF,
        src_bytes=_docs_bytes(sf_dir) if sf_dir else None,
    ).select("a", "b")
    lbl = connected_components(pairs)
    w = Window.partitionBy("canonical_id").orderBy(
        F.desc("quality"), "doc_id"
    )
    ranked = (
        lbl.select(
            F.col("id").alias("doc_id"), F.col("lbl").alias("canonical_id")
        )
        .join(qual, "doc_id")
        .withColumn("rn", F.row_number().over(w))
    )
    return qual, ranked


@query(
    "dedup_keep_best",
    driver=False,
    doc="""Quality-aware canonical selection: within each near-dup
    cluster keep the LONGEST document (ties to the smallest doc_id) —
    the policy real curation pipelines apply (the min-id rule of
    `dedup_clusters` is arbitrary; near-dup groups usually contain
    truncated/boilerplate variants and the longest normalized text is
    the standard keep heuristic). Composition: the same Pregel-lite
    connected components, a per-doc quality signal, and one bounded
    per-cluster window (cluster sizes are small by construction, so the
    window never sees corpus-scale partitions). Oracle: the shared
    WITH RECURSIVE closure + the same window in SQL.""",
    oracle=_CLOSURE_CTES
    + _QUAL_RANKED_CTES
    + """
SELECT r.doc_id AS doc_id, k.doc_id AS keep_id,
       r.doc_id = k.doc_id AS kept, r.quality AS quality
FROM ranked r
JOIN (SELECT canonical_id, doc_id FROM ranked WHERE rn = 1) k
     USING (canonical_id)
ORDER BY doc_id
""",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, ranked = _quality_ranked(spark, sf_dir)
    keep = ranked.filter(F.col("rn") == 1).select(
        "canonical_id", F.col("doc_id").alias("keep_id")
    )
    return (
        ranked.join(keep, "canonical_id")
        .select(
            "doc_id",
            "keep_id",
            (F.col("doc_id") == F.col("keep_id")).alias("kept"),
            "quality",
        )
        .orderBy("doc_id")
    )


@query(
    "pipeline_training_manifest",
    doc="""End-to-end training-set manifest: the composed curation
    pipeline a user runs before a training job — near-dup clustering
    (word-3-gram Jaccard >= 0.5, Pregel-lite components) with the
    keep-longest canonical policy, a minimum-quality gate (normalized
    length >= 100), and the deterministic hash split (md5 bucket ->
    80/10/10) — emitting one audit row per document: its fate
    ('kept' / 'dup_dropped' / 'quality_dropped'), its split ('none'
    when dropped), and its quality signal. Every stage is the
    already-verified operator (dedup_keep_best's closure + window,
    scale_deterministic_split's bucket idiom) composed into ONE plan;
    the oracle replays the full composition, so the pipeline is
    value-checked end to end, not just stage by stage.""",
    oracle=_CLOSURE_CTES
    + _QUAL_RANKED_CTES
    + """,
fate AS (
    SELECT q.doc_id, q.quality,
           CASE WHEN r.rn > 1 THEN 'dup_dropped'
                WHEN q.quality < 100 THEN 'quality_dropped'
                ELSE 'kept' END AS status
    FROM qual q LEFT JOIN ranked r ON r.doc_id = q.doc_id
)
SELECT doc_id, status,
       CASE WHEN status = 'kept' THEN
           CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS STRING)),
                           1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST(('0x' || substr(md5(CAST(doc_id AS STRING)),
                           1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
                ELSE 'test' END
       ELSE 'none' END AS split,
       quality
FROM fate ORDER BY doc_id
""",
)
def pipeline_training_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..functions.embedding import bucket_expr

    qual, ranked = _quality_ranked(spark, sf_dir)
    ranked = ranked.select("doc_id", "rn")
    status = F.when(F.col("rn") > 1, "dup_dropped").when(
        F.col("quality") < 100, "quality_dropped"
    ).otherwise("kept")
    bucket = bucket_expr(F.col("doc_id").cast("string"), 100)
    split = F.when(
        F.col("status") == "kept",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test"),
    ).otherwise("none")
    return (
        qual.join(ranked, "doc_id", "left")
        .withColumn("status", status)
        .select("doc_id", "status", split.alias("split"), "quality")
        .orderBy("doc_id")
    )


@query(
    "dedup_incremental_minhash",
    doc="""Incremental ingest-time near-dup: a NEW batch (the planted
    variants, doc_id >= 500000000) is checked against the EXISTING corpus
    (doc_id < 500000000) without ever pairing the existing corpus with
    itself. Band keys for the existing side are a persisted index at
    cluster scale (here: the same generationally-cached signature
    derivation every other minhash query shares); at ingest only the
    new batch's signatures are computed, the band join is
    new-batch-sized on one side, and verification touches candidate
    pairs only. Each new doc gets a keep/reject verdict with its best
    existing match — the decision a 100 TB ingestion pipeline makes per
    arriving shard.""",
    fixtures_used=("corpus",),
    oracle="WITH "
    + _SHINGLES_CTE
    + f""",
perms AS (
    SELECT doc_id, p.i AS perm,
           (p.a * (shingle % {MINHASH_P}) + p.b) % {MINHASH_P} AS h
    FROM sh, (VALUES {", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(minhash_perm_constants(12))
    )}) AS p(i, a, b)
),
sig AS (
    SELECT doc_id, perm, min(h) AS minhash
    FROM perms GROUP BY doc_id, perm
),
bandkeys AS (
    SELECT doc_id, CAST(perm // 3 AS INT) AS band,
           md5(array_to_string(list_sort(list(minhash)), ',')) AS band_key
    FROM sig GROUP BY doc_id, band
),
cands AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bandkeys x JOIN bandkeys y USING (band, band_key)
    WHERE x.doc_id < 500000000 AND y.doc_id >= 500000000
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
    SELECT c.a AS a, c.b AS b, count(*) AS common
    FROM cands c
    JOIN sh x ON x.doc_id = c.a
    JOIN sh y ON y.doc_id = c.b AND y.shingle = x.shingle
    GROUP BY 1, 2
),
verified AS (
    SELECT m.a AS a, m.b AS b,
           round(CAST(m.common AS DOUBLE)
                 / (sa.sz + sb.sz - m.common), 4) AS jaccard
    FROM common m
    JOIN sizes sa ON sa.doc_id = m.a
    JOIN sizes sb ON sb.doc_id = m.b
    WHERE round(CAST(m.common AS DOUBLE)
                / (sa.sz + sb.sz - m.common), 4) >= 0.5
),
ranked AS (
    SELECT b, a, jaccard,
           row_number() OVER (PARTITION BY b
                              ORDER BY jaccard DESC, a) AS rn,
           count(*) OVER (PARTITION BY b) AS n_matches
    FROM verified
)
SELECT b AS new_id, a AS matched_id, jaccard AS best_jaccard,
       CAST(n_matches AS BIGINT) AS n_matches
FROM ranked WHERE rn = 1
ORDER BY new_id
""",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import (
        jaccard_verify_from_lists,
        lsh_band_keys,
        minhash_signatures,
    )

    corpus = spark.table("corpus")
    # Same shingle/signature derivation (and scoped caches) as
    # dedup_minhash_lsh — back-to-back runs share the index by plan
    # identity, exactly how a stored LSH index amortizes across ingests.
    sh, lists, sig = _shared_dedup_index(spark, sf_dir)
    if sig is None:
        sig = minhash_signatures(corpus, num_perm=12, shingles=sh)
    keys = lsh_band_keys(sig)
    old = keys.filter(F.col("doc_id") < 500000000).select(
        F.col("doc_id").alias("a"), "band", "band_key"
    )
    new = keys.filter(F.col("doc_id") >= 500000000).select(
        F.col("doc_id").alias("b"), "band", "band_key"
    )
    cands = (
        old.join(new.hint("shuffle_hash"), ["band", "band_key"])
        .select("a", "b")
        .distinct()
    )
    verified = (
        jaccard_verify_from_lists(cands, lists, threshold=0.5)
        if lists is not None
        else jaccard_verify(corpus, cands, threshold=0.5, shingles=sh)
    )
    w = Window.partitionBy("b").orderBy(F.desc("jaccard"), "a")
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .withColumn("n_matches", F.count("*").over(Window.partitionBy("b")))
        .filter(F.col("rn") == 1)
        .select(
            F.col("b").alias("new_id"),
            F.col("a").alias("matched_id"),
            F.col("jaccard").alias("best_jaccard"),
            F.col("n_matches").cast("long").alias("n_matches"),
        )
    )


@query(
    "dedup_passage_boilerplate",
    driver=False,
    doc="""Passage-level (sub-document) dedup — the boilerplate-removal
    pass a training pipeline runs besides whole-doc dedup: split each
    document into non-overlapping 10-token passages, hash each to a
    60-bit key, flag passages appearing in >= 2 distinct documents,
    and report each document's shared-passage fraction (planted corpus
    copies surface as fraction 1.0; near-copies as high fractions).
    Scale shape: one explode -> distinct(doc, passage) shuffle, a
    map-combined passage-frequency aggregate whose >= 2 survivors
    broadcast back as a semi-join probe, then one per-doc aggregate —
    no self-join, 8-byte keys, work linear in corpus tokens.""",
    fixtures_used=("corpus",),
    oracle="""
WITH toks AS (
    SELECT doc_id,
           regexp_extract_all(
               regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'),
               '[a-z0-9]+') AS t
    FROM corpus
),
passages AS (
    SELECT DISTINCT doc_id,
           CAST(('0x' || substr(md5(array_to_string(
               t[i * 10 + 1 : i * 10 + 10], ' ')), 1, 15)) AS BIGINT)
               AS phash
    FROM toks,
         unnest(generate_series(0, CAST(len(t) // 10 AS INT) - 1)) AS s(i)
    WHERE len(t) >= 10
),
shared AS (
    SELECT phash FROM passages GROUP BY phash
    HAVING count(*) >= 2
)
SELECT p.doc_id AS doc_id,
       count(*) AS n_passages,
       CAST(sum(CASE WHEN s.phash IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_shared,
       round(sum(CASE WHEN s.phash IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS shared_fraction
FROM passages p LEFT JOIN shared s USING (phash)
GROUP BY p.doc_id
HAVING sum(CASE WHEN s.phash IS NOT NULL THEN 1 ELSE 0 END) > 0
ORDER BY doc_id
""",
)
def dedup_passage_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import hash60, tokens

    toks = spark.table("corpus").select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") >= 10)
    passages = (
        toks.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(0), (F.size("t") / 10).cast("int") - 1
                        ),
                        lambda i: hash60(
                            F.concat_ws(
                                " ", F.slice("t", i * 10 + 1, 10)
                            )
                        ),
                    )
                )
            ).alias("phash"),
        )
    )
    passages = scoped_cache(passages)
    shared = (
        passages.groupBy("phash")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("phash")
    )
    marked = passages.join(
        F.broadcast(shared).withColumn("_hit", F.lit(1)),
        "phash",
        "left",
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum(
                F.when(F.col("_hit").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_shared"),
            F.round(
                F.sum(
                    F.when(F.col("_hit").isNotNull(), 1).otherwise(0)
                )
                / F.count("*").cast("double"),
                4,
            ).alias("shared_fraction"),
        )
        .filter(F.col("n_shared") > 0)
        .orderBy("doc_id")
    )


@query(
    "dedup_substring_spans",
    # Driver tier since late r4 (rotated in as the family's newest
    # capability).
    doc="""Exact-substring duplicated-span dedup — the distributed form
    of suffix-array substring dedup (Lee et al. 2022): hash every
    stride-1 12-token window, keep windows whose global frequency is
    >= 2 (across documents OR repeated within one), merge each doc's
    surviving window starts into maximal spans, and report per-doc
    span count / duplicated-token budget. Complements
    `dedup_passage_boilerplate` (non-overlapping blocks can straddle
    a copied region and miss it; stride-1 windows cannot) and the
    whole-doc near-dup family (which scores documents, not spans).
    Planted corpus copies surface as full-doc spans; the
    appended-tail / changed-head plants surface as spans covering
    exactly the shared region. Scale shape: linear window explosion,
    map-combined frequency groupBy on 60-bit keys, shuffle-hash
    survivor rejoin (never broadcast), per-doc span-merge windows —
    see `operators/dedup.duplicated_spans`.""",
    fixtures_used=("corpus",),
    oracle="""
WITH toks AS (
    SELECT doc_id,
           regexp_extract_all(
               regexp_replace(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'),
               '[a-z0-9]+') AS t
    FROM corpus
),
wins AS (
    SELECT doc_id, len(t) AS n_tokens, i AS pos,
           CAST(('0x' || substr(md5(array_to_string(
               t[i + 1 : i + 12], ' ')), 1, 15)) AS BIGINT) AS whash
    FROM toks,
         unnest(generate_series(0, CAST(len(t) AS INT) - 12)) AS s(i)
    WHERE len(t) >= 12
),
dup AS (
    SELECT whash FROM wins GROUP BY whash HAVING count(*) >= 2
),
hits AS (
    SELECT w.doc_id, w.n_tokens, w.pos,
           CASE WHEN lag(w.pos) OVER
                        (PARTITION BY w.doc_id ORDER BY w.pos) IS NULL
                     OR w.pos > lag(w.pos) OVER
                        (PARTITION BY w.doc_id ORDER BY w.pos) + 12
                THEN 1 ELSE 0 END AS brk
    FROM wins w JOIN dup d USING (whash)
),
islands AS (
    SELECT doc_id, n_tokens, pos,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS island
    FROM hits
),
spans AS (
    SELECT doc_id, max(n_tokens) AS n_tokens, island,
           min(pos) AS s, max(pos) + 12 AS e
    FROM islands GROUP BY doc_id, island
)
SELECT doc_id,
       CAST(max(n_tokens) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(e - s) AS BIGINT) AS dup_tokens,
       round(sum(e - s) / CAST(max(n_tokens) AS DOUBLE), 4)
           AS dup_fraction
FROM spans
GROUP BY doc_id
ORDER BY doc_id
""",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import duplicated_spans

    return duplicated_spans(spark.table("corpus"), w=12)


@query(
    "dedup_semantic_semdedup",
    # Driver tier since the r8 rotation (dedup_simhash to local parity).
    doc="""SemDeDup-style semantic pruning (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding corpus, rank each item by
    its redundancy WITHIN its cluster (max cosine to any lower-id
    cluster-mate), and prune the most-redundant ceil(n/4) items per
    cluster. Complements `dedup_embedding_cosine`: that query blocks
    candidates by random-hyperplane LSH bands (pair-threshold
    semantics); this one blocks by k-means cell and prunes a FIXED
    FRACTION per cluster — the paper's actual control knob, which
    keeps working when the corpus has no hard near-dups (prunes the
    relatively-most-redundant tail instead of nothing).

    Determinism end to end: clustering is the quantized integer Lloyd
    of `scale_kmeans_topics` (assignments are a pure function of the
    input set); cosine is rounded to 4dp; every ranking tie breaks on
    ids. The oracle replays the full composition — 3 unrolled Lloyd
    iterations, the within-cluster pair scores, both ranking windows —
    so an ITERATIVE clustering feeding a pruning policy is
    value-parity-checked in SQL.

    Scale shape (100 TB): assignment is a stateless map (centroids are
    driver-held literals — KBs); the only corpus shuffle keys on
    `cluster` for the pair join. Within-cluster pairing is quadratic
    in CLUSTER size by design — SemDeDup's contract is k ~ n/target
    so cells stay bounded (the paper uses 50k clusters for 600M
    items); the windows partition by item and by cluster, never
    globally. The vector rescore inherits `rescore_candidates`'
    size-aware join (broadcast below the gate, shuffle-hash above).""",
    oracle=_KMEANS_CTES
    + """,
assign AS (
    SELECT vec_id, CAST(m % 8 AS INT) AS cluster FROM a3
),
pairs AS (
    SELECT x.vec_id AS a, y.vec_id AS b, y.cluster AS cluster,
           round(CASE WHEN list_inner_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]) = 0
                 OR list_inner_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]) = 0 THEN 0.0
            ELSE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) END, 4) + 0 AS sim
    FROM assign x
    JOIN assign y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
    JOIN embeddings ea ON ea.vec_id = x.vec_id
    JOIN embeddings eb ON eb.vec_id = y.vec_id
),
red AS (
    SELECT b, cluster, a, sim,
           row_number() OVER (PARTITION BY b ORDER BY sim DESC, a) AS rn
    FROM pairs
),
r1 AS (
    SELECT b, cluster, a AS witness, sim AS redundancy
    FROM red WHERE rn = 1
),
sizes AS (
    SELECT cluster, CAST(count(*) AS BIGINT) AS n
    FROM assign GROUP BY cluster
),
rk AS (
    SELECT r1.b, r1.cluster, r1.witness, r1.redundancy, s.n,
           row_number() OVER (PARTITION BY r1.cluster
                              ORDER BY r1.redundancy DESC, r1.b) AS rk
    FROM r1 JOIN sizes s USING (cluster)
)
SELECT b AS removed, cluster, witness, redundancy
FROM rk WHERE rk <= (n + 3) // 4
ORDER BY removed
""",
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import semdedup_prune
    from ..session import table_path
    from ..sources.parquet_io import parquet_bytes_on_disk

    emb = spark.table("embeddings")
    vec_bytes = parquet_bytes_on_disk(table_path(sf_dir, "embeddings"))
    return semdedup_prune(
        emb.select("vec_id", "embedding"), k=8, iters=3, vec_bytes=vec_bytes
    )


@query(
    "dedup_semantic_incremental",
    driver=False,
    doc="""Ingest-time semantic near-dup gate, the embedding twin of
    `dedup_incremental_minhash`: an ARRIVING batch (vec_id % 10 == 7)
    is classified against the EXISTING corpus (the rest) under the
    existing corpus' FROZEN centroid model — no refit per shard, no
    existing-x-existing or incoming-x-incoming pairing. Per new item:
    its cluster, best same-cluster existing match (cosine 4dp, ties to
    the smallest existing id) and the keep/reject verdict at 0.92. An
    item landing in a cluster with no existing members keeps a NULL
    match and is_dup=false.

    The oracle refits the same 3-pass quantized Lloyd on the EXISTING
    subset via the parameterized CTE template (plans/scale.kmeans_ctes),
    assigns the incoming batch under the final model with one more
    distance CTE, and replays the directional pair scan — the full
    fit->freeze->classify lifecycle is value-parity-checked.

    Scale shape: model fit amortizes over corpus maintenance (it is the
    persisted centroid table); per arriving shard the work is one
    stateless assignment map over the shard + one cluster-keyed join
    whose left side is shard-sized. The existing-side assignment is the
    persisted (id, cluster) table at cluster scale.""",
    oracle=kmeans_ctes("(SELECT * FROM embeddings WHERE vec_id % 10 <> 7)")
    + """,
exi AS (
    SELECT vec_id AS b, CAST(m % 8 AS INT) AS cluster FROM a3
),
iq0 AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                         AS BIGINT)) AS q
    FROM embeddings WHERE vec_id % 10 = 7
),
iq AS (
    SELECT * FROM iq0 WHERE len(q) = (SELECT d FROM mdim)
),
iqe AS (
    SELECT vec_id, CAST(t.i AS INT) AS pos, q[CAST(t.i AS INT)] AS v
    FROM iq, unnest(generate_series(1, len(q))) AS t(i)
),
idist AS (
    SELECT iqe.vec_id, ce.c,
           sum((iqe.v - ce.cv) * (iqe.v - ce.cv)) AS d
    FROM iqe JOIN c2e ce USING (pos)
    GROUP BY 1, 2
),
iassign AS (
    SELECT vec_id AS a, CAST(min(d * 8 + c) % 8 AS INT) AS cluster
    FROM idist GROUP BY vec_id
),
ipairs AS (
    SELECT i.a AS a, e.b AS b,
           round(CASE WHEN list_inner_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]) = 0
                 OR list_inner_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]) = 0 THEN 0.0
            ELSE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) END, 4) + 0 AS sim
    FROM iassign i JOIN exi e USING (cluster)
    JOIN embeddings ea ON ea.vec_id = i.a
    JOIN embeddings eb ON eb.vec_id = e.b
),
ibest AS (
    SELECT a, b, sim,
           row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
    FROM ipairs
)
SELECT i.a AS new_id, i.cluster AS cluster,
       x.b AS matched_id, x.sim AS best_sim,
       COALESCE(x.sim >= 0.92, FALSE) AS is_dup
FROM iassign i
LEFT JOIN ibest x ON x.a = i.a AND x.rn = 1
ORDER BY new_id
""",
)
def dedup_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import semdedup_incremental
    from ..session import table_path
    from ..sources.parquet_io import parquet_bytes_on_disk

    emb = spark.table("embeddings").select("vec_id", "embedding")
    existing = emb.filter(F.col("vec_id") % 10 != 7)
    incoming = emb.filter(F.col("vec_id") % 10 == 7)
    vec_bytes = parquet_bytes_on_disk(table_path(sf_dir, "embeddings"))
    return semdedup_incremental(
        existing, incoming, k=8, iters=3, threshold=0.92,
        vec_bytes=vec_bytes,
    )


@query(
    "dedup_fuzzy_linkage",
    driver=False,
    doc="""Fuzzy record linkage (operators/linkage.py): token-blocked
    Levenshtein matching over the DISTINCT p_name value domain —
    block on a shared whitespace token through one inverted-index
    shuffle (DF-capped like the shingle index), length-band filter
    inside the join, edit-distance verify once per deduplicated
    candidate pair, then broadcast the value-level verdicts back onto
    per-value row counts. The entity-resolution primitive the
    set-similarity dedup family lacked: raw edit distance catches
    typo-class variants that shingle Jaccard underweights. Contract
    (shared-token AND |len diff|<=3 AND levenshtein<=3) is mirrored
    exactly by the oracle.""",
    oracle="""
WITH names AS (
    SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL
),
toks0 AS (
    SELECT DISTINCT name, t.tok
    FROM names, unnest(regexp_split_to_array(name, '[ \\t\\n\\x0B\\f\\r]+')) AS t(tok)
    WHERE length(t.tok) > 0
),
toks AS (
    SELECT t.name, t.tok FROM toks0 t
    JOIN (SELECT tok FROM toks0
          GROUP BY tok HAVING count(*) <= 256) c USING (tok)
),
cand AS (
    SELECT DISTINCT a.name AS name_a, b.name AS name_b
    FROM toks a JOIN toks b USING (tok)
    WHERE a.name < b.name
      AND abs(length(a.name) - length(b.name)) <= 3
),
pairs AS (
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS dist
    FROM cand WHERE levenshtein(name_a, name_b) <= 3
),
counts AS (SELECT p_name AS name, count(*) AS n FROM part GROUP BY 1)
SELECT p.name_a, p.name_b, p.dist,
       ca.n AS rows_a, cb.n AS rows_b
FROM pairs p
JOIN counts ca ON ca.name = p.name_a
JOIN counts cb ON cb.name = p.name_b
ORDER BY name_a, name_b
""",
)
def dedup_fuzzy_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import fuzzy_linkage_report

    return fuzzy_linkage_report(
        spark.table("part"), "p_name", max_dist=3, max_token_df=256
    ).orderBy("name_a", "name_b")
