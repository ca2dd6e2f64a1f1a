"""Deduplication operators for large-scale corpus curation.

Beyond the reference's surface (its only dedup is key-wise upsert,
models/embeddingmodel.js:4-12): the standard near-dup toolkit a 100 TB
training-data pipeline needs, each expressed as pure DataFrame plans.

Scale architecture notes:
* Exact: one groupBy on a content hash — a single shuffle of (hash,
  id), never of document text.
* N-gram Jaccard: inverted-index self-join on shingle hashes — only
  docs sharing a shingle ever meet; no all-pairs cross join.
* MinHash + LSH banding: signature is ``num_perm`` mins computed in one
  explode+groupBy pass; candidate generation joins on band keys, so
  work scales with collisions, not pairs. Band/row parameters trade
  recall vs candidates exactly as in the MinHash literature.
* SimHash: 60-bit weighted-majority hash; near-dup pairs join on
  15-bit band exact-match (pigeonhole: hamming<=3 over 4 bands
  guarantees one identical band), then verify by popcount(xor).

All hashing is md5-prefix based (identical in Spark/DuckDB/Python) so
every operator is oracle-checkable; swap to xxhash64 for raw speed at
production scale — plan shapes are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# shared text canonicalization
# --------------------------------------------------------------------------


def normalized_text(text: Column) -> Column:
    """Whitespace-collapse + trim + lowercase — the canonical form."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def content_hash(text: Column) -> Column:
    return F.md5(normalized_text(text))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct md5 hashes of word n-grams of the normalized text."""
    toks = F.regexp_extract_all(normalized_text(text), F.lit("[a-z0-9]+"), 0)
    return F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))
            ),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
        )
    )


def exploded_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) rows — the inverted-index input."""
    return df.select(
        id_col, F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    )


# --------------------------------------------------------------------------
# exact + n-gram Jaccard
# --------------------------------------------------------------------------


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical (after normalization) documents."""
    return (
        df.select(id_col, content_hash(F.col(text_col)).alias("chash"))
        .groupBy("chash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard via inverted-index join.

    |A ∩ B| comes from the shingle self-join; |A ∪ B| = |A|+|B|-|A∩B|.
    Only ordered pairs (a < b) are produced.
    """
    sh = exploded_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("common")
                / (F.col("sza") + F.col("szb") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 12,
    n: int = 3,
) -> DataFrame:
    """(id, perm, minhash) — num_perm permutations simulated by salting
    the shingle hash; one explode + one groupBy, no per-row Python."""
    sh = exploded_shingles(df, text_col, id_col, n)
    perms = sh.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("perm"),
        "shingle",
    )
    return perms.groupBy(id_col, "perm").agg(
        F.min(
            F.md5(F.concat(F.col("perm").cast("string"), F.lit(":"), "shingle"))
        ).alias("minhash")
    )


def lsh_band_keys(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 3,
) -> DataFrame:
    """(id, band, band_key): md5 over the band's concatenated minhashes."""
    return (
        signatures.withColumn(
            "band", (F.col("perm") / rows_per_band).cast("int")
        )
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("minhash")))
            ).alias("band_key")
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 12,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Candidate pairs sharing at least one LSH band (a < b)."""
    rows_per_band = num_perm // bands
    keys = lsh_band_keys(
        minhash_signatures(df, text_col, id_col, num_perm, n),
        id_col,
        bands,
        rows_per_band,
    )
    a = keys.select(F.col(id_col).alias("a"), "band", "band_key")
    b = keys.select(F.col(id_col).alias("b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 md5 hex digits -> fits a signed 64-bit int


def _token_hash60(token: Column) -> Column:
    return F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("bigint")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash): weighted-majority bit vote over token hashes.

    One explode over tokens, one explode over bit positions, one
    groupBy — linear in corpus token count, no pairwise work.
    """
    toks = df.select(
        id_col,
        F.explode(
            F.regexp_extract_all(
                normalized_text(F.col(text_col)), F.lit("[a-z0-9]+"), 0
            )
        ).alias("token"),
    )
    hashed = (
        toks.groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _token_hash60(F.col("token")))
    )
    votes = hashed.select(
        id_col,
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    ).select(
        id_col,
        "bit",
        # shiftright/shiftleft take literal bit counts in the Python
        # API; the SQL forms accept column-valued shifts.
        F.when(
            F.expr("shiftright(h, bit) & 1") == 1, F.col("tf")
        )
        .otherwise(-F.col("tf"))
        .alias("vote"),
    )
    return (
        votes.groupBy(id_col, "bit")
        .agg(F.sum("vote").alias("v"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(
                    F.col("v") > 0,
                    F.expr("shiftleft(cast(1 as bigint), bit)"),
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("simhash")
        )
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Blocking: split the 60 bits into 4 bands of 15; any pair within
    hamming 3 must agree exactly on >=1 band (pigeonhole), so the join
    is an equality join on (band, band_bits) — never all-pairs.
    """
    sh = simhash(df, text_col, id_col)
    bands = sh.select(
        id_col,
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn(
        "band_bits", F.expr("shiftright(simhash, band * 15) & 32767")
    )
    a = bands.select(
        F.col(id_col).alias("a"), F.col("simhash").alias("ha"),
        "band", "band_bits",
    )
    b = bands.select(
        F.col(id_col).alias("b"), F.col("simhash").alias("hb"),
        "band", "band_bits",
    )
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
