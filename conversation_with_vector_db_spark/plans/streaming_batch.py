"""Streaming semantics, batch-checkable form (SURVEY §2.13 X1-X8).

Structured Streaming plans and their batch equivalents share the same
DataFrame expressions; the driver oracle checks the batch form here,
and tests/test_streaming.py runs the REAL streams (file source ->
watermark -> memory sink, plus applyInPandasWithState sessions in
:mod:`..streaming.sessions`) and asserts they converge to these exact
results — the standard streaming-correctness argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import fixtures
from .registry import query

#: Tool-continuation depth cap for X5 (run depth = prompt_id % 3 < 3).
CONTINUATION_MAX_DEPTH = 2


@query(
    "x5_stream_continuation",
    # r8 rotation: to local parity (X keeps driver rows via x3, x8) —
    # v8_hybrid_rrf promoted in.
    driver=False,
    doc="""X5/X6: recursive tool-call continuation to fixpoint
    (sockets/assistants/assistantHandler.js:89-137 re-enters the model
    stream with each tool result until the run completes;
    assistantController.js:206-233 polls the run). Batch form: each run
    starts with its prompt tokens and depth = prompt_id % 3 pending
    tool rounds; round k adds base div (k+1) tokens. Spark expands by
    BOUNDED ITERATION (depth-many frontier unions — a pure plan, no
    driver actions); the oracle is a genuine WITH RECURSIVE CTE.
    tests/test_streaming.py drives the same semantics through a LIVE
    feedback-loop stream (continuation_sink) to convergence against
    this result.""",
    oracle=f"""
WITH RECURSIVE prompts AS ({fixtures.PROMPTS_SQL}),
runs AS (
    SELECT prompt_id AS run_id,
           coalesce(tokenused, 0) AS base,
           CAST(prompt_id % 3 AS INT) AS depth
    FROM prompts
    WHERE NOT is_deleted AND prompt_id < 1000
),
expand AS (
    SELECT run_id, base, 0 AS round, base AS total, depth FROM runs
    UNION ALL
    SELECT run_id, base, round + 1, total + base // (round + 2), depth
    FROM expand WHERE round < depth
)
SELECT run_id,
       CAST(round AS INT) AS n_rounds,
       CAST(total AS BIGINT) AS total_tokens
FROM expand WHERE round = depth
ORDER BY run_id
""",
)
def x5_stream_continuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    fixtures.register_derived_views(spark)
    seed = (
        spark.table("prompts")
        .filter(~F.col("is_deleted") & (F.col("prompt_id") < 1000))
        .select(
            F.col("prompt_id").alias("run_id"),
            F.coalesce("tokenused", F.lit(0)).alias("base"),
            F.lit(0).alias("round"),
            F.coalesce("tokenused", F.lit(0)).alias("total"),
            (F.col("prompt_id") % 3).cast("int").alias("depth"),
        )
    )
    # Spark has no recursive CTE; the continuation depth is bounded by
    # construction, so the fixpoint is depth-many frontier expansions
    # unioned — still one declarative plan, no mid-build actions.
    frontier = seed
    tiers = [seed]
    for _ in range(CONTINUATION_MAX_DEPTH):
        frontier = frontier.filter(F.col("round") < F.col("depth")).select(
            "run_id",
            "base",
            (F.col("round") + 1).alias("round"),
            (F.col("total") + F.expr("base div (round + 2)")).alias("total"),
            "depth",
        )
        tiers.append(frontier)
    out = tiers[0]
    for tier in tiers[1:]:
        out = out.unionByName(tier)
    return (
        out.filter(F.col("round") == F.col("depth"))
        .select(
            "run_id",
            F.col("round").cast("int").alias("n_rounds"),
            F.col("total").cast("bigint").alias("total_tokens"),
        )
        .orderBy("run_id")
    )


@query(
    "x1_stream_accumulation",
    driver=False,
    doc="""X1: per-chunk accumulation of a token stream into the final
    answer (sockets/chat/chatServices.js:17-55): the batch-converged
    state is one transcript per conversation in arrival order plus the
    chunk count (the terminal emit).""",
    fixtures_used=("conversations",),
    oracle="""
SELECT conversation_id,
       string_agg(message, ' ' ORDER BY ts, message) AS transcript,
       count(*) AS n_chunks
FROM conversations
WHERE conversation_id IN ('c5-0', 'c5-1', 'c9-2')
GROUP BY conversation_id
ORDER BY conversation_id
""",
)
def x1_stream_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("conversations")
        .filter(F.col("conversation_id").isin("c5-0", "c5-1", "c9-2"))
        .groupBy("conversation_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "message"))
                    ),
                    lambda s: s.message,
                ),
            ).alias("transcript"),
            F.count("*").alias("n_chunks"),
        )
        .orderBy("conversation_id")
    )


@query(
    "x4_running_prefix_emit",
    driver=False,
    doc="""X2+X4: the SSE re-emit of the accumulated prefix on every
    chunk with a running counter (sockets/chat/chatServices.js:34-39) —
    update-mode output of a running aggregate, as an ordered prefix
    window per conversation.""",
    fixtures_used=("conversations",),
    oracle="""
SELECT conversation_id, ts,
       string_agg(message, ' ') OVER (
           PARTITION BY conversation_id ORDER BY ts, message
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
       CAST(row_number() OVER (
           PARTITION BY conversation_id ORDER BY ts, message) AS BIGINT)
           AS chunk_no
FROM conversations
WHERE conversation_id = 'c7-0'
ORDER BY ts, message
""",
)
def x4_running_prefix_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("conversation_id")
        .orderBy("ts", "message")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("conversation_id").orderBy("ts", "message")
    return (
        spark.table("conversations")
        .filter(F.col("conversation_id") == "c7-0")
        .select(
            "conversation_id",
            "ts",
            F.concat_ws(" ", F.collect_list("message").over(w)).alias(
                "prefix"
            ),
            F.row_number().over(wo).cast("long").alias("chunk_no"),
        )
        .orderBy("ts", "message")
    )


@query(
    "x3_session_window_ttl",
    doc="""X3: the Redis 15-min idle-TTL conversation session
    (controllers/conversationController.js:14,57,78) as
    session_window(ts, '15 minutes') — verified against the classic
    gaps-and-islands SQL (new session when gap >= 900s, matching
    Spark's strict-less-than merge rule).""",
    oracle="""
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w >= INTERVAL 900 SECOND
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def x3_session_window_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("events")
        .filter(F.col("user_id") < 10)
        .groupBy(
            "user_id", F.session_window("ts", "15 minutes").alias("sw")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
        # Presentation sort dropped (r11): the gate hashes
        # order-insensitively and the ORDER BY cost a range exchange.
    )


@query(
    "x7_daily_cron_digest",
    driver=False,
    doc="""X7: the 05:00 daily cron email digest (app.js:83-86;
    service/cronEmailService.js:6-13): yesterday's rows joined to user
    details — Trigger.AvailableNow scheduled batch, window pinned to
    the fixed anchor date.""",
    fixtures_used=("users",),
    oracle="""
SELECT u.user_id AS user_id, u.email AS email,
       count(*) AS n_events,
       round(sum(e.value), 4) AS total_value
FROM events e
JOIN users u ON u.user_id = e.user_id
WHERE e.ts >= TIMESTAMP '2024-01-29 00:00:00'
  AND e.ts < TIMESTAMP '2024-01-30 00:00:00'
GROUP BY u.user_id, u.email
ORDER BY u.user_id
""",
)
def x7_daily_cron_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import load_table_in_range

    users = spark.table("users")
    return (
        load_table_in_range(
            spark, sf_dir, "events", "ts", "2024-01-29", "2024-01-30"
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .join(F.broadcast(users.select("user_id", "email")), "user_id")
        .select("user_id", "email", "n_events", "total_value")
        .orderBy("user_id")
    )


@query(
    "x8_finalize_etl",
    doc="""X8: the post-stream finalize transaction
    (sockets/chat/chatHandler.js:124-171): persist prompt, price the
    tokens, decrement the budget, append the usage row — one plan
    producing the day's usage rows joined to the running budget state,
    idempotent on (user, day).""",
    fixtures_used=("prompts", "users", "token_prices"),
    oracle="""
WITH day_prompts AS (
    SELECT userid, modelused,
           coalesce(tokenused, 0) AS tokens
    FROM prompts
    WHERE promptdate = DATE '2024-01-15' AND NOT is_deleted
),
priced AS (
    SELECT p.userid, p.tokens,
           coalesce(tp.input, 0.01) AS price_in
    FROM day_prompts p
    LEFT JOIN token_prices tp ON tp.model = p.modelused
)
SELECT u.user_id AS user_id,
       count(*) AS n_prompts,
       CAST(sum(p.tokens) AS BIGINT) AS tokens_spent,
       sum(CAST(floor(p.tokens * p.price_in * 10 + 0.5) AS BIGINT))
           / 10000.0 AS cost,
       CAST(u.max_user_tokens - sum(p.tokens) AS BIGINT)
           AS budget_remaining
FROM priced p
JOIN users u ON u.user_id = p.userid
GROUP BY u.user_id, u.max_user_tokens
ORDER BY u.user_id
""",
)
def x8_finalize_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    prompts = (
        spark.table("prompts")
        .filter(
            (F.col("promptdate") == F.lit("2024-01-15").cast("date"))
            & ~F.col("is_deleted")
        )
        .select(
            "userid",
            "modelused",
            F.coalesce("tokenused", F.lit(0)).alias("tokens"),
        )
    )
    prices = spark.table("token_prices").select(
        F.col("model").alias("modelused"), F.col("input").alias("price_in")
    )
    users = spark.table("users").select("user_id", "max_user_tokens")
    priced = prompts.join(F.broadcast(prices), "modelused", "left").select(
        "userid",
        "tokens",
        F.coalesce("price_in", F.lit(0.01)).alias("price_in"),
    )
    return (
        priced.groupBy("userid")
        .agg(
            F.count("*").alias("n_prompts"),
            F.sum("tokens").alias("tokens_spent"),
            # Quantize PER ROW (half-up to 1e-4 cost units, one IEEE
            # product per row — identical doubles on both engines),
            # then sum exact integers: flooring the float SUM sat
            # within ulps of an integer boundary (token*price products
            # are decimal multiples of 1e-4), where partition-order
            # accumulation could land either side and flip the
            # driver's value hash.
            (
                F.sum(
                    F.floor(
                        F.col("tokens") * F.col("price_in") * 10
                        + F.lit(0.5)
                    ).cast("bigint")
                )
                / F.lit(10000.0)
            ).alias("cost"),
        )
        .join(
            F.broadcast(users), F.col("userid") == F.col("user_id")
        )
        .select(
            "user_id",
            "n_prompts",
            "tokens_spent",
            "cost",
            (F.col("max_user_tokens") - F.col("tokens_spent")).alias(
                "budget_remaining"
            ),
        )
        .orderBy("user_id")
    )
