"""Usage/cost analytics queries (SURVEY §2.7, §2.11 C14-C15, §3.3).

The reference's analytics surface is MongoDB aggregation pipelines over
``TrackUsage`` plus client-side reductions over ``prompts``
(controllers/trackUsageController.js, controllers/promptController.js).
Here each becomes one declarative plan: filter -> partial-agg ->
broadcast join dims -> project -> sort, so Catalyst pushes predicates
into the parquet scan and AQE picks broadcast joins.

Scale notes: aggregation happens BEFORE the user join (the reference's
own $group-before-$lookup shape, trackUsageController.js:69-89) so the
shuffle carries one row per (day,user), not per event; ``users`` /
``token_prices`` are dims -> broadcast, no shuffle on the fact side
beyond the single groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query

# Fixed month window (FIXTURES.md determinism rules: never now()).
MONTH_START = "2024-01-01"
MONTH_END = "2024-02-01"


@query(
    "flagship_usage_daily_by_user",
    doc="""Flagship (§3.3): GET /get-all-track-usage-monthly re-expressed.
    Mirrors controllers/trackUsageController.js:61-107 — $match month
    window (F3) -> $group {year,month,day,user} with sums (A1) ->
    $lookup users + $unwind (J1) -> $project (P3) -> $sort day (O3).""",
    fixtures_used=("users",),
    oracle="""
SELECT CAST(year(e.ts) AS INT)        AS y,
       CAST(month(e.ts) AS INT)      AS m,
       CAST(day(e.ts) AS INT)        AS d,
       e.user_id                      AS user_id,
       count(*)                       AS usage_count,
       round(sum(e.value), 4)         AS total_value,
       u.lname                        AS user_name,
       u.role                         AS role
FROM events e
JOIN users u ON e.user_id = u.user_id
WHERE e.ts >= TIMESTAMP '2024-01-01' AND e.ts < TIMESTAMP '2024-02-01'
GROUP BY 1, 2, 3, 4, 7, 8
ORDER BY d, user_id
""",
)
def flagship_usage_daily_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.table("events")
    users = spark.table("users")
    daily = (
        events.filter(
            (F.col("ts") >= F.lit(MONTH_START)) & (F.col("ts") < F.lit(MONTH_END))
        )
        .groupBy(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            "user_id",
        )
        .agg(
            F.count("*").alias("usage_count"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    return (
        daily.join(
            F.broadcast(users.select("user_id", "lname", "role")),
            "user_id",
            "inner",
        )
        .select(
            "y",
            "m",
            "d",
            "user_id",
            "usage_count",
            "total_value",
            F.col("lname").alias("user_name"),
            "role",
        )
        .orderBy("d", "user_id")
    )


@query(
    "a2_global_rollup",
    doc="""A2: grand-total rollup, $group {_id:null, $sum, $sum}
    (controllers/trackUsageController.js:116-127).""",
    fixtures_used=("usage",),
    oracle="""
SELECT round(sum(total_token_cost), 4) AS total_cost,
       CAST(sum(total_tokens) AS BIGINT) AS total_tokens,
       count(*) AS usage_rows
FROM usage
""",
)
def a2_global_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.table("usage").agg(
        F.round(F.sum("total_token_cost"), 4).alias("total_cost"),
        F.sum("total_tokens").alias("total_tokens"),
        F.count("*").alias("usage_rows"),
    )


@query(
    "a3_conditional_aggregate",
    doc="""A3: $sum of $cond — active/inactive assistant counts per
    category (controllers/assistantController.js:429-467).""",
    fixtures_used=("assistants",),
    oracle="""
SELECT category,
       count(*) AS total_assistants,
       CAST(sum(CASE WHEN is_active THEN 1 ELSE 0 END) AS BIGINT)
           AS active_assistants,
       CAST(sum(CASE WHEN NOT is_active THEN 1 ELSE 0 END) AS BIGINT)
           AS inactive_assistants
FROM assistants
WHERE NOT is_deleted
GROUP BY category
ORDER BY total_assistants DESC, category
""",
)
def a3_conditional_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("assistants")
        .filter(~F.col("is_deleted"))
        .groupBy("category")
        .agg(
            F.count("*").alias("total_assistants"),
            F.sum(F.when(F.col("is_active"), 1).otherwise(0)).alias(
                "active_assistants"
            ),
            F.sum(F.when(~F.col("is_active"), 1).otherwise(0)).alias(
                "inactive_assistants"
            ),
        )
        .orderBy(F.desc("total_assistants"), "category")
    )


@query(
    "a8_per_model_period_usage",
    doc="""A8: the reference's 70-line manual model x period matrix
    (promptController.js:579-648) collapsed into one grouped plan over
    (model, month) — Spark's idiomatic upgrade of 6 separate queries.""",
    fixtures_used=("prompts",),
    oracle="""
SELECT coalesce(modelused, 'unknown') AS model,
       CAST(month(promptdate) AS INT) AS m,
       CAST(sum(tokenused) AS BIGINT) AS tokens_used,
       count(*) AS prompt_count
FROM prompts
WHERE tokenused IS NOT NULL AND NOT is_deleted
GROUP BY 1, 2
ORDER BY model, m
""",
)
def a8_per_model_period_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(F.col("tokenused").isNotNull() & ~F.col("is_deleted"))
        .groupBy(
            F.coalesce("modelused", F.lit("unknown")).alias("model"),
            F.month("promptdate").alias("m"),
        )
        .agg(
            F.sum("tokenused").alias("tokens_used"),
            F.count("*").alias("prompt_count"),
        )
        .orderBy("model", "m")
    )


@query(
    "c14_cost_formula",
    doc="""C14+C15: provider-dependent cost arithmetic with price-table
    lookup and 0.01 fallback (service/trackUsageService.js:36-99;
    constants/tokenPrices.js). openai divides by 1000, gemini doesn't,
    claude is 0 — reproduced exactly.""",
    fixtures_used=("usage", "token_prices"),
    oracle="""
SELECT p.provider AS provider,
       count(*) AS n_calls,
       round(sum(CASE p.provider
           WHEN 'openai' THEN (u.input_token * p.input
                               + u.output_token * p.output) / 1000
           WHEN 'gemini' THEN u.input_token * p.input
                              + u.output_token * p.output
           ELSE 0.0 END), 6) AS recomputed_cost,
       round(sum(u.total_token_cost), 6) AS stored_cost
FROM usage u
JOIN token_prices p ON u.model_used = p.model
GROUP BY p.provider
ORDER BY p.provider
""",
)
def c14_cost_formula(spark: SparkSession, sf_dir: str) -> DataFrame:
    usage = spark.table("usage")
    prices = spark.table("token_prices")
    joined = usage.join(F.broadcast(prices), usage.model_used == prices.model)
    cost = (
        F.when(
            F.col("provider") == "openai",
            (F.col("input_token") * F.col("input")
             + F.col("output_token") * F.col("output")) / 1000,
        )
        .when(
            F.col("provider") == "gemini",
            F.col("input_token") * F.col("input")
            + F.col("output_token") * F.col("output"),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        joined.groupBy("provider")
        .agg(
            F.count("*").alias("n_calls"),
            F.round(F.sum(cost), 6).alias("recomputed_cost"),
            F.round(F.sum("total_token_cost"), 6).alias("stored_cost"),
        )
        .orderBy("provider")
    )


@query(
    "a11_budget_running_decrement",
    doc="""A11+A12: per-chat token-budget decrement
    (service/userService.js:31-49,62-82) as a cumulative window — the
    distributed rewrite of the reference's read-modify-write loop.
    Returns each user's final remaining budget and exhaustion flag.""",
    fixtures_used=("users", "prompts"),
    oracle="""
SELECT u.user_id AS user_id,
       u.max_user_tokens AS max_user_tokens,
       CAST(sum(coalesce(p.tokenused, 0)) AS BIGINT) AS spent,
       CAST(u.max_user_tokens - sum(coalesce(p.tokenused, 0)) AS BIGINT)
           AS remaining,
       (u.max_user_tokens - sum(coalesce(p.tokenused, 0))) <= 0
           AS exhausted
FROM users u
JOIN prompts p ON p.userid = u.user_id
WHERE NOT p.is_deleted
GROUP BY u.user_id, u.max_user_tokens
ORDER BY u.user_id
""",
)
def a11_budget_running_decrement(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = spark.table("users")
    prompts = spark.table("prompts").filter(~F.col("is_deleted"))
    spent = prompts.groupBy("userid").agg(
        F.sum(F.coalesce("tokenused", F.lit(0))).alias("spent")
    )
    return (
        spent.join(
            F.broadcast(users.select("user_id", "max_user_tokens")),
            spent.userid == F.col("user_id"),
        )
        .select(
            "user_id",
            "max_user_tokens",
            "spent",
            (F.col("max_user_tokens") - F.col("spent")).alias("remaining"),
            ((F.col("max_user_tokens") - F.col("spent")) <= 0).alias(
                "exhausted"
            ),
        )
        .orderBy("user_id")
    )
