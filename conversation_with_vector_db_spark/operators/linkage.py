"""Fuzzy record linkage: token-blocked Levenshtein pair matching over
a string key column — the entity-resolution primitive (Zingg/Dedupe
style "block, then verify") the near-dup family lacked: every other
dedup variant works on token SETS (shingles, minhash bands, simhash
bits); this one scores raw EDIT distance, which catches typo-class
variants ("large bolt" ~ "large rod") that set-based similarity
underweights.

Semantics (the operator's contract, mirrored exactly by the oracle):
two distinct VALUES of the key column form a match when

* they share at least one whitespace token (the blocking predicate),
* their lengths differ by at most ``max_dist`` (implied by the edit
  bound; stated so the pruning is part of the spec), and
* ``levenshtein(a, b) <= max_dist``.

Token blocking is the documented trade: it is how production linkage
systems avoid the O(n^2) comparison space, and a pair whose every
token was edited is out of scope by definition (use the char-ngram
Jaccard plan for that regime).

Scale shape:

* **Values, not rows.** Linkage runs over ``DISTINCT`` key values —
  on a 100 TB fact table the distinct-value domain is orders of
  magnitude smaller than the row count, and the row-level result is
  a broadcast-back join of the value-level verdicts.
* **Inverted-index blocking.** ``value -> explode(tokens)`` then a
  self-equi-join on the token — one hash shuffle keyed by token;
  candidates only materialize for values that share a block. A DF cap
  (``max_token_df``) drops stop-tokens that would quadratically
  inflate a block, same discipline as the shingle index's MAX_DF.
* **Cheap filters before the expensive one**: the length-band filter
  runs inside the join before ``levenshtein`` (O(len^2) per pair)
  evaluates, and each candidate pair is deduplicated (one row per
  (a, b), however many tokens they share) BEFORE verification so the
  quadratic scorer runs once per pair.

Reference parity: the reference's closest behavior is Mongoose's
collation-insensitive exact match on name fields (models/*.js); fuzzy
matching is part of the curation surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_value_pairs(
    df: DataFrame,
    key_col: str,
    max_dist: int = 3,
    max_token_df: int = 256,
) -> DataFrame:
    """Matched pairs of distinct ``key_col`` values:
    ``(name_a, name_b, dist)`` with ``name_a < name_b``.

    One token-keyed shuffle builds the candidate set; Levenshtein runs
    once per deduplicated candidate pair.
    """
    names = df.select(F.col(key_col).alias("name")).where(
        F.col("name").isNotNull()
    ).distinct()
    # WHITESPACE_CLASS, not \s: Java and RE2 disagree on \x0B, and the
    # oracle splits with the identical explicit class.
    from .dedup import WHITESPACE_CLASS

    toks = names.select(
        "name",
        F.explode(
            F.array_distinct(F.split(F.col("name"), WHITESPACE_CLASS))
        ).alias("tok"),
    ).where(F.length("tok") > 0)
    # Stop-token cap: a token shared by more than max_token_df distinct
    # values multiplies the candidate space quadratically while carrying
    # no discriminative signal (same role as the shingle index's MAX_DF).
    df_cap = toks.groupBy("tok").agg(
        F.count("*").alias("_df")
    ).where(F.col("_df") <= F.lit(max_token_df))
    toks = toks.join(df_cap.select("tok"), "tok")

    a = toks.select(F.col("name").alias("name_a"), "tok")
    b = toks.select(F.col("name").alias("name_b"), "tok")
    cand = (
        a.join(b, "tok")
        .where(
            (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b"))
                <= F.lit(max_dist)
            )
        )
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.where(
        F.levenshtein("name_a", "name_b") <= F.lit(max_dist)
    ).select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    )


def fuzzy_linkage_report(
    df: DataFrame,
    key_col: str,
    max_dist: int = 3,
    max_token_df: int = 256,
) -> DataFrame:
    """Row-level impact of the value-level matches: each matched value
    pair annotated with how many rows carry each value —
    ``(name_a, name_b, dist, rows_a, rows_b)``.

    The per-value row counts aggregate BEFORE the join (map-side
    combinable, value-keyed), and the pair table is value-domain-sized,
    so nothing row-scale crosses a second shuffle.
    """
    pairs = fuzzy_value_pairs(df, key_col, max_dist, max_token_df)
    counts = df.groupBy(F.col(key_col).alias("name")).agg(
        F.count("*").alias("rows")
    )
    return (
        pairs.join(
            counts.select(
                F.col("name").alias("name_a"),
                F.col("rows").alias("rows_a"),
            ),
            "name_a",
        )
        .join(
            counts.select(
                F.col("name").alias("name_b"),
                F.col("rows").alias("rows_b"),
            ),
            "name_b",
        )
        .select("name_a", "name_b", "dist", "rows_a", "rows_b")
    )
