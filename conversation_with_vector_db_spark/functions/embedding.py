"""Deterministic surrogate embedding featurizer (SURVEY §2.2 T3-T5).

The reference embeds with OpenAI ``text-embedding-ada-002`` /
``3-small`` (controllers/embeddingController.js:27-31,
utils/textutils.js:12-18, conversationController.js:30) — an external,
nondeterministic API. Per FIXTURES.md determinism rules the engine
replaces it with a hashing-trick featurizer so every vector is
reproducible and oracle-checkable:

    token -> bucket = md5-hex-prefix(token) mod dim -> tf counts
          -> L2 normalize

md5 is used (not murmur/xxhash) because Spark, DuckDB, and Python all
expose the identical digest — the whole pipeline stays cross-engine
verifiable. At 100 TB you'd swap ``_bucket_expr`` to ``xxhash64`` for
speed; the shape of the plan (explode -> groupBy -> normalize, all
JVM-side) is unchanged.

Two output shapes:
* sparse triples ``(id, idx, weight)`` — the scalable form; cosine
  between sparse vectors is a join on ``idx`` + sum of products, which
  shuffles only non-zero entries.
* dense ``array<double>`` — for interop with the dense ``embeddings``
  fixture ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 256

TOKEN_PATTERN = "[a-z0-9]+"


def tokens_expr(text: Column) -> Column:
    """Lowercased alphanumeric tokens — the deterministic tokenizer."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def bucket_expr(token: Column, dim: int = DEFAULT_DIM) -> Column:
    """Hash bucket: first 8 hex digits of md5 -> int -> mod dim.
    Identical semantics in Spark (conv), DuckDB (0x cast) and Python
    (int(hexdigest[:8], 16))."""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("bigint")
        % dim
    )


def featurize_sparse(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Text table -> L2-normalized sparse vectors (id, idx, weight)."""
    counts = (
        df.select(
            id_col, F.explode(tokens_expr(F.col(text_col))).alias("token")
        )
        .select(id_col, bucket_expr(F.col("token"), dim).alias("idx"))
        .groupBy(id_col, "idx")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    from pyspark.sql import Window

    norm = Window.partitionBy(id_col)
    return counts.withColumn(
        "weight", F.col("tf") / F.sqrt(F.sum(F.col("tf") ** 2).over(norm))
    ).select(id_col, "idx", "weight")


def featurize_dense(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Text table -> (id, embedding array<double>), L2-normalized."""
    sparse = featurize_sparse(df, text_col, id_col, dim)
    # Scatter sparse entries into a dense array via a map lookup —
    # stays JVM-side (map_from_entries + transform over a range).
    return (
        sparse.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("idx", "weight"))
            ).alias("m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                # element_at on a MAP is KEY-based and the keys are the
                # bucket indices 0..dim-1 themselves — no +1 (that's
                # only for 1-based ARRAY lookup).
                lambda i: F.coalesce(
                    F.element_at("m", i.cast("bigint")), F.lit(0.0)
                ),
            ).alias("embedding"),
        )
    )


def sparse_cosine(
    a: DataFrame, b: DataFrame, a_id: str = "a_id", b_id: str = "b_id"
) -> DataFrame:
    """All-pairs cosine between two sparse vector tables (already
    L2-normalized, so cosine = sum of weight products) — the scalable
    inverted-index join: only shared buckets shuffle.

    Inputs must carry exactly one id column besides ``idx``/``weight``
    (any name, any position) — resolved BY NAME, and enforced: a
    positional ``columns[0]`` guess would silently group by the wrong
    key on a reordered select."""

    def id_of(df: DataFrame) -> str:
        ids = [c for c in df.columns if c not in ("idx", "weight")]
        if len(ids) != 1:
            raise ValueError(
                "sparse_cosine: expected exactly one id column besides "
                f"idx/weight, got {df.columns}"
            )
        return ids[0]

    left = a.select(
        F.col(id_of(a)).alias(a_id), "idx", F.col("weight").alias("wa")
    )
    right = b.select(
        F.col(id_of(b)).alias(b_id), "idx", F.col("weight").alias("wb")
    )
    return (
        left.join(right, "idx")
        .groupBy(a_id, b_id)
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("sim"))
    )
