"""Vectorized text statistics — size-gated regex counting.

``F.regexp_count`` runs java.util.regex per row inside whole-stage
codegen: zero Python round-trip, unbeatable at fixture scale. But
backtracking Java regex is several-× slower than a linear-time engine
on char-class scans, and the gap compounds with corpus size: at sf10
(500 k docs) the three quality-score counts cost ~18 s on 32 cores
JVM-side, while pyarrow.compute's RE2 engine does the same counts in
~5 s on ONE thread. Past a size threshold the regex work dwarfs the
Arrow worker round-trip, so this module applies the repo's standard
cost-gate discipline (PLANS.md "Cost gates"): JVM below, Arrow/RE2
above, identical values on both branches (pinned by test).

Pattern contract: callers use the common Java/RE2 subset — character
classes, alternation, ``+``/``*``, and ``\\b`` word boundaries with
**ASCII semantics** (word chars = ``[0-9A-Za-z_]``). ASCII is the only
portable meaning: RE2 (and therefore the DuckDB oracle) has no
Unicode ``\\b``, while java.util.regex's ``\\b`` IS Unicode-aware —
'aé' is one Java word but two RE2 words. The JVM branch therefore
REWRITES every top-level ``\\b`` into an explicit ASCII-boundary
lookaround pair (verified value-identical to RE2 on
accent-adjacent text by test); ``\\b`` inside a character class
(backspace) is outside the contract. No backreferences, no caller
lookaround (RE2 has neither).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Below this on-disk source size the JVM branch wins: the Python
#: worker round-trip plus the under-parallel repartition exceed what
#: RE2 saves on a tiny corpus. Measured r4 (steady exec, warm
#: workers): sf0.01/190 KB JVM 0.25 s vs Arrow 0.24 s (cold 1.8 vs
#: 2.3 — JVM wins one-shot); sf0.1/0.6 MB 0.54 vs 0.20; sf1/3.9 MB
#: 2.0 vs 0.29; sf10/38 MB 18.2 vs 0.6 — the RE2 advantage grows
#: linearly with text volume, so only sub-MB corpora keep the
#: worker-free JVM path. UNKNOWN size picks the Arrow branch:
#: linear-time regex is the branch that survives scale.
ARROW_REGEX_MIN_BYTES = 512 << 10

#: Size-derived parallelism for the Arrow regex pass (r11). Measured
#: (steady exec, warm workers, 32 cores): sf0.1/0.6 MB stays fastest
#: UNSPLIT — 1-way 0.26 s vs 2-way 0.34 vs 32-way 0.45 (the exchange
#: + task wave loses on a small corpus at ANY width); sf1/3.9 MB
#: flips — 8-way 0.51 s vs 4-way 0.74 vs 1-way 0.70. So: no
#: repartition below MIN_BYTES, one task per BYTES_PER_TASK of
#: COMPRESSED source above it (text decompresses ~4x), capped at
#: cores — sf1 lands on the measured-best 8, sf10/38 MB saturates
#: every core.
ARROW_REPART_MIN_BYTES = 2 << 20
ARROW_REPART_BYTES_PER_TASK = 512 << 10

#: Java lookaround pair emulating RE2's ASCII word boundary: a
#: position either entering or leaving a run of ``[0-9A-Za-z_]``.
#: Java's native ``\\b`` is Unicode-aware and counts differently next
#: to accented letters (e.g. Java sees ONE word in 'aé'), which would
#: break both cross-branch identity and oracle (RE2) agreement.
_ASCII_B = (
    "(?:(?<![0-9A-Za-z_])(?=[0-9A-Za-z_])"
    "|(?<=[0-9A-Za-z_])(?![0-9A-Za-z_]))"
)


def java_ascii_pattern(pattern: str) -> str:
    """Rewrite every ``\\b`` in a pattern to the explicit ASCII
    boundary — for callers that stay on JVM regex expressions outside
    :func:`with_regex_counts` but must agree with the RE2/DuckDB
    ``\\b`` semantics (see module docstring)."""
    return pattern.replace(r"\b", _ASCII_B)


def uses_arrow_branch(src_bytes: int | None) -> bool:
    """THE branch predicate for :func:`with_regex_counts` — exposed so
    callers that must co-vary with the branch choice (e.g. sort
    placement around the Python stage) cannot drift from it."""
    return src_bytes is None or src_bytes >= ARROW_REGEX_MIN_BYTES


def with_regex_counts(
    df: DataFrame,
    counts: list[tuple[str, str, bool]],
    text_col: str = "text",
    src_bytes: int | None = None,
    drop_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Append one BIGINT match-count column per ``(name, pattern,
    lowercase_first)`` spec, counting non-overlapping matches of
    ``pattern`` in ``text_col`` (lowercased first when the flag is
    set — computed once and shared across all lowercase specs).

    Size-gated: below :data:`ARROW_REGEX_MIN_BYTES` (JVM
    ``regexp_count``, no Python round-trip, ``\\b`` rewritten to the
    ASCII emulation — see module docstring); above or unknown (ONE
    ``mapInArrow`` pass evaluating every pattern with pyarrow's RE2
    directly on the Arrow buffers). Both branches produce identical
    values for patterns within the module's stated contract.

    ``drop_cols`` names input columns the caller does not want back
    (typically the text itself): on the Arrow branch they are omitted
    from the RETURN batches, so the heavy payload crosses the Python
    boundary once (in) instead of twice (guide §4.1 — a post-hoc
    ``.drop`` cannot un-ship what the opaque function already
    returned); the JVM branch drops them in the plan, keeping both
    branches schema-identical.
    """
    if not counts:
        return df
    if not uses_arrow_branch(src_bytes):
        out = df
        lowered = F.lower(F.col(text_col))
        for name, pattern, lower in counts:
            src = lowered if lower else F.col(text_col)
            jpat = java_ascii_pattern(pattern)
            out = out.withColumn(
                name, F.regexp_count(src, F.lit(jpat)).cast("long")
            )
        return out.drop(*drop_cols) if drop_cols else out

    keep = [f for f in df.schema.fields if f.name not in drop_cols]
    base = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in keep
    )
    fields = ", ".join(f"{name} long" for name, _, _ in counts)
    schema = f"{base}, {fields}"

    # A narrow map inherits the scan's parallelism; a single-file
    # corpus (the fixture layout) plans as ONE input partition, which
    # would serialize the whole regex pass onto one worker. Spread it
    # first — but only as wide as the measured per-task payoff
    # (:data:`ARROW_REPART_BYTES_PER_TASK`): a sub-MB corpus runs
    # faster on its single partition than behind an exchange + a
    # task wave, and a many-file cluster-scale table already scans
    # wide and must NOT pay a full-text shuffle here. Unknown size
    # spreads to every core — the assume-big default, matching the
    # branch predicate's own unknown-size choice.
    cores = df.sparkSession.sparkContext.defaultParallelism
    if src_bytes is None:
        want = cores
    elif src_bytes < ARROW_REPART_MIN_BYTES:
        want = 1
    else:
        want = min(
            cores,
            -(-src_bytes // ARROW_REPART_BYTES_PER_TASK),  # ceil div
        )
    if df.rdd.getNumPartitions() < want:
        df = df.repartition(want)

    keep_names = [f.name for f in keep]
    names = keep_names + [n for n, _, _ in counts]

    def score(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        # mapInArrow, not mapInPandas: the pandas bridge materializes
        # one Python str object per document per pass, which costs
        # more than the regex work it wraps; RE2 runs on the Arrow
        # buffers directly.
        for batch in batches:
            arr = batch.column(text_col)
            low = None
            cols = [batch.column(k) for k in keep_names]
            for _, pattern, lower in counts:
                if lower and low is None:
                    low = pc.utf8_lower(arr)
                src = low if lower else arr
                cols.append(
                    pc.count_substring_regex(src, pattern).cast(pa.int64())
                )
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return df.mapInArrow(score, schema=schema)


#: Dictionary-encode gate for the bigram LM: broadcast the token dim
#: when the measured vocabulary has at most this many types. 1M short
#: tokens ≈ tens of MB broadcast — comfortably under executor memory;
#: real web corpora with larger vocabularies take the string path.
VOCAB_BROADCAST_MAX = 1_000_000


def bigram_nll_scores(docs: DataFrame) -> DataFrame:
    """CCNet-style statistical quality scoring: train an add-one-
    smoothed bigram language model ON the corpus itself and score each
    document by its average negative log-probability (nats) — low
    scores mark formulaic/boilerplate-like text, high scores mark
    out-of-distribution noise; curation keeps the middle band. (CCNet
    scores against a pretrained KenLM; the self-trained corpus model is
    the same mechanics with no external artifact, which also makes it
    oracle-replayable.)

    Cross-engine determinism: ``p = (c_bigram + 1) / (c_prev + V)`` is
    one IEEE division of exact integers, identical everywhere; each
    row's ``ln(p)`` is quantized to integer micro-nats (half-up) BEFORE
    summing, so the per-doc aggregate is an exact integer sum — the
    same per-row-quantize discipline as x8's cost column, because a
    float sum's partition accumulation order is not reproducible.

    Scale shape: bigram explosion is linear in corpus tokens and
    feeds (a) one map-side-combined groupBy building the bigram count
    table and (b) the scoring join. When the measured vocabulary fits
    the broadcast gate (``VOCAB_BROADCAST_MAX`` types — the count is
    one cheap job over the already-cached unigram table), tokens are
    DICTIONARY-ENCODED first: the token dim broadcasts onto the
    instance stream (no shuffle), unigram counts ride along with the
    encode so the type-level model join disappears, and the two
    remaining instance-sized exchanges (bigram groupBy + scoring join)
    key on longs instead of strings. Past the gate — web-scale vocab —
    the string path runs unchanged: shuffle-hash on (prev, cur)/(prev),
    never broadcast (count tables are data-sized), with V as a
    broadcast one-row cross join. Output: ``doc_id, n_bigrams,
    avg_nll`` per document with >= 2 tokens.
    """
    from .cache import scoped_cache
    from .dedup import tokens

    # Cached: BOTH the bigram explode and the unigram/vocab branch
    # re-traverse the tokenized corpus — without the cache the full
    # scan + normalize + regexp extraction runs twice.
    toks = scoped_cache(
        docs.select("doc_id", tokens(F.col("text")).alias("t")).filter(
            F.size("t") >= 2
        )
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(2), F.size("t")),
                lambda i: F.struct(
                    F.element_at("t", i - 1).alias("prev"),
                    F.element_at("t", i).alias("cur"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.prev", "b.cur")
    uni = scoped_cache(
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c_prev"))
    )
    v_count = uni.count()  # cheap on the cached vocab-sized table
    if v_count <= VOCAB_BROADCAST_MAX:
        # Dictionary-encoded path. Ids only need to be bijective WITHIN
        # this run (they never leave the plan and the NLL is invariant
        # under any relabeling), so monotonically_increasing_id on the
        # aggregated vocab is safe — no global sort, no collision risk
        # a hashed id would carry.
        dim = uni.withColumn("wid", F.monotonically_increasing_id())
        enc = scoped_cache(
            bg.join(
                F.broadcast(
                    dim.select(
                        F.col("w").alias("prev"),
                        F.col("wid").alias("pid"),
                        "c_prev",
                    )
                ),
                "prev",
            )
            .join(
                F.broadcast(
                    dim.select(
                        F.col("w").alias("cur"), F.col("wid").alias("cid")
                    )
                ),
                "cur",
            )
            .select("doc_id", "pid", "cid", "c_prev")
        )
        # c_prev is constant within a (pid, cid) group, so first() is
        # value-deterministic here.
        model = (
            enc.groupBy("pid", "cid")
            .agg(
                F.count("*").alias("c_bg"),
                F.first("c_prev").alias("c_prev"),
            )
            .select(
                "pid",
                "cid",
                F.floor(
                    F.log(
                        (F.col("c_bg") + F.lit(1.0))
                        / (F.col("c_prev") + F.lit(float(v_count)))
                    )
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("q"),
            )
        )
        scored = enc.join(model.hint("shuffle_hash"), ["pid", "cid"]).select(
            "doc_id", "q"
        )
        return _nll_rollup(scored)
    bg = scoped_cache(bg)
    vocab = uni.agg(F.count("*").alias("v"))
    bgc = bg.groupBy("prev", "cur").agg(F.count("*").alias("c_bg"))
    # Score bigram TYPES, then join instances once: the model table is
    # |distinct bigrams| rows, so the type-level bgc-x-uni join is tiny
    # next to the instance stream, and the instance-sized shuffle
    # happens exactly once instead of twice. (sf1-neutral — profiling
    # shows the bigram explode construction dominates there — but the
    # instance stream is the term that grows with corpus size.)
    model = (
        bgc.join(uni.hint("shuffle_hash"), F.col("prev") == F.col("w"))
        .crossJoin(F.broadcast(vocab))
        .select(
            "prev",
            "cur",
            F.floor(
                F.log(
                    (F.col("c_bg") + F.lit(1.0))
                    / (F.col("c_prev") + F.col("v"))
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("q"),
        )
    )
    scored = bg.join(model.hint("shuffle_hash"), ["prev", "cur"]).select(
        "doc_id", "q"
    )
    return _nll_rollup(scored)


def _nll_rollup(scored: DataFrame) -> DataFrame:
    """Per-doc average of the micro-nat-quantized bigram NLLs — shared
    tail of the encoded and string scoring paths."""
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                (-F.sum("q")).cast("double")
                / (F.count("*") * F.lit(1e6)),
                4,
            ).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


def dsir_importance_scores(
    docs: "DataFrame",
    is_target,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> "DataFrame":
    """DSIR-style importance scoring (Xie et al. 2023,
    arXiv:2302.03169): per-document log importance ratio between a
    TARGET distribution (rows where ``is_target`` — a boolean Column —
    holds) and the RAW corpus, over hashed unigram buckets.

    Both distributions are add-one smoothed; each bucket's two ln's
    are quantized to integer micro-nats BEFORE differencing and
    summing (the :func:`bigram_nll_scores` discipline), so every
    document's score is an exact integer sum — partitioning-invariant
    and replayable in SQL.

    Scale shape: the two histograms are map-side-combined
    ``n_buckets``-row aggregates; totals are window sums over that
    tiny frame; the model broadcasts onto the token stream, so
    scoring adds no shuffle beyond the per-doc groupBy.

    Returns (id, n_toks, importance_micronats) — one row per document
    with >= 1 token; positive scores lean target-like.
    """
    from ..functions.embedding import bucket_expr, tokens_expr
    from .cache import scoped_cache

    # Token-bucket stream: feeds the raw histogram, the target
    # histogram, and the scoring pass — one tokenize, cached.
    tok = scoped_cache(
        docs.select(
            id_col,
            is_target.alias("_tgt"),
            F.explode(tokens_expr(F.col(text_col))).alias("token"),
        ).select(
            id_col, "_tgt", bucket_expr(F.col("token"), n_buckets).alias("b")
        )
    )
    raw = tok.groupBy("b").agg(F.count("*").alias("c_r"))
    tgt = tok.filter(F.col("_tgt")).groupBy("b").agg(
        F.count("*").alias("c_t")
    )
    # n_buckets-row model frame; totals as unpartitioned window sums
    # over it (exact integers — the frame is the whole histogram).
    w_all = Window.partitionBy()
    joined = raw.join(tgt, "b", "left").select(
        "b",
        F.col("c_r"),
        F.coalesce("c_t", F.lit(0).cast("bigint")).alias("ct0"),
    )

    def micronat(num, den):
        return F.floor(
            F.log(num / den.cast("double")) * 1e6 + F.lit(0.5)
        ).cast("bigint")

    model = joined.select(
        "b",
        (
            micronat(
                F.col("ct0") + F.lit(1.0),
                F.sum("ct0").over(w_all) + F.lit(n_buckets),
            )
            - micronat(
                F.col("c_r") + F.lit(1.0),
                F.sum("c_r").over(w_all) + F.lit(n_buckets),
            )
        ).alias("q"),
    )
    return (
        tok.join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("q").alias("importance_micronats"),
        )
    )
