"""Distributed BPE merge-table training (Sennrich et al. 2016,
arXiv:1508.07909) — the tokenizer-training step of an LLM data
pipeline, built Spark-first.

The classic trick that makes BPE trainable at corpus scale is that
after the first word-count pass NOTHING touches the corpus again: every
merge iteration operates on the WORD VOCABULARY weighted by word
frequency. Here:

* ``corpus -> (word, count)`` is the only corpus-sized shuffle (one
  map-side-combined groupBy over exploded tokens).
* Each iteration counts adjacent symbol pairs over the vocab (a
  vocab-sized groupBy whose shuffle carries (l, r, partial-count)
  rows), collects exactly ONE row (the argmax pair — the model, not
  data), and applies the merge as a stateless JVM fold over each
  word's symbol array — no Python, no UDF, no extra shuffle.
* The merge application (:func:`merge_pair_fold`) is a left-to-right
  non-overlapping scan expressed as ``F.aggregate`` with an
  (out, prev) struct accumulator — whole-stage-codegen'd, and exactly
  the semantics every reference BPE implementation uses (``aaaa`` with
  merge (a,a) -> ``aa aa``).

Determinism: pair counts are exact integers; the argmax tie-breaks on
(count DESC, left, right) — a total order — so the merge table is a
pure function of the corpus and the SQL oracle (unrolled per step,
with a gaps-and-islands reconstruction of the non-overlapping scan)
matches value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import scoped_cache

#: Tokenizer shared with the oracle: lowercased maximal [a-z0-9] runs.
TOKEN_RE = "[a-z0-9]+"


def merge_pair_fold(syms, l: str, r: str):
    """Column expression: apply ONE BPE merge (l, r) to an
    ``array<string>`` symbol column — left-to-right, non-overlapping.

    Fold state is ``struct(out array<string>, prev string)``: ``prev``
    holds the one symbol whose fate is undecided (it may start a merge
    with the NEXT symbol). A step either completes a merge (append
    ``l || r``, clear ``prev``) or retires ``prev`` to the output and
    holds the current symbol. Non-overlap falls out for free: a
    completed merge clears ``prev``, so its right half can never start
    the next merge — ``aaa`` under (a,a) gives ``aa a``, never
    ``a aa`` or an overlapped ``aa aa``.
    """
    merged = F.lit(l + r)

    def step(acc, s):
        hit = F.coalesce(acc["prev"] == F.lit(l), F.lit(False)) & (
            s == F.lit(r)
        )
        return F.when(
            hit,
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc["prev"].isNull(), acc["out"])
                .otherwise(F.concat(acc["out"], F.array(acc["prev"])))
                .alias("out"),
                s.alias("prev"),
            )
        )

    def finish(acc):
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )
    return F.aggregate(syms, init, step, finish)


def bpe_train(
    docs: DataFrame,
    merges: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Train ``merges`` BPE merge steps over a document corpus.

    Returns the merge table: one row per step —
    ``(step, lhs, rhs, pair_count, n_symbols)`` where ``pair_count`` is
    the corpus-weighted frequency of the chosen pair at selection time
    and ``n_symbols`` the distinct symbol-type count of the vocabulary
    AFTER applying the merge (the growing tokenizer alphabet).

    The returned frame is assembled from per-step driver-collected
    scalars (the model — one argmax row and one count per step), the
    same lifecycle as :func:`~.clustering.quantized_lloyd`'s centroid
    collection; all counting and merge application is distributed.
    """
    spark = docs.sparkSession
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    vocab = scoped_cache(
        words.withColumn(
            "syms",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            ),
        )
    )
    out_rows = []
    for step_no in range(1, merges + 1):
        pairs = (
            # sequence(1, 0) would generate a DESCENDING [1, 0] in
            # Spark — guard out 1-symbol words instead (they carry no
            # adjacent pair, matching the oracle's empty
            # generate_series).
            vocab.filter(F.size("syms") >= 2)
            .select(
                "wc",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("c"))
        )
        top = pairs.orderBy(F.desc("c"), "l", "r").first()
        if top is None:
            break  # vocabulary fully merged — nothing left to pair
        l, r, c = top["l"], top["r"], int(top["c"])
        vocab = scoped_cache(
            vocab.withColumn("syms", merge_pair_fold(F.col("syms"), l, r))
        )
        n_symbols = (
            vocab.select(F.explode("syms").alias("s"))
            .agg(F.countDistinct("s").alias("n"))
            .first()["n"]
        )
        out_rows.append((step_no, l, r, c, int(n_symbols)))
    return spark.createDataFrame(
        out_rows,
        "step int, lhs string, rhs string, pair_count bigint, "
        "n_symbols bigint",
    ).orderBy("step")


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Encode a corpus under a FROZEN merge table; per-document token
    accounting — the apply half of the tokenizer lifecycle.

    The merge chain is applied once per DISTINCT word (the vocabulary,
    not the corpus): chars -> fold(merge 1) -> ... -> fold(merge M),
    all JVM expressions. Documents then join their word stream to the
    (word, n_syms, n_chars) vocabulary — broadcast when the vocab is
    small (the common case: vocabularies are millions of rows against
    billions of documents); pass ``broadcast_vocab=False`` past the
    broadcast gate — the join then shuffles on a word key whose
    cardinality makes AQE's skew split effective.

    Returns (doc_id, n_words, n_bpe_tokens, chars_per_token) where
    chars_per_token = tokenized chars / BPE tokens rounded to 4dp
    (NULL for wordless documents) — the compression the learned merges
    deliver, the metric a tokenizer-training pipeline tracks.
    """
    tokenized = docs.select(
        id_col,
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
        ).alias("_words"),
    )
    syms = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    for l, r in merges:
        syms = merge_pair_fold(syms, l, r)
    vocab = (
        tokenized.select(F.explode("_words").alias("word"))
        .distinct()
        .select(
            "word",
            F.size(syms).alias("_n_syms"),
            F.length("word").cast("bigint").alias("_n_chars"),
        )
    )
    per_doc = (
        tokenized.select(id_col, F.explode("_words").alias("word"))
        .join(
            F.broadcast(vocab) if broadcast_vocab
            else vocab.hint("shuffle_hash"),
            "word",
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("_n_syms").alias("n_bpe_tokens"),
            F.sum("_n_chars").alias("_chars"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0).cast("bigint")).alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0).cast("bigint")).alias(
                "n_bpe_tokens"
            ),
            F.round(
                F.col("_chars") / F.col("n_bpe_tokens").cast("double"), 4
            ).alias("chars_per_token"),
        )
        .orderBy(id_col)
    )
