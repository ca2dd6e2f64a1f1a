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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_table_in_range
from .registry import query


def _csq_footer_bound(df: DataFrame, value_col: str) -> float | None:
    """Upper bound on the GLOBAL sum of squared cents from parquet
    footer statistics alone — zero Spark jobs, the same metadata
    discipline as the FK stats pruning (sources/datasource.py): bound
    = total_rows * (max |value|*100 + 1)^2. ``None`` (no claim) when
    the frame isn't file-backed (synthetic temp views), any file is
    unreadable locally, or any row group lacks min/max stats — the
    caller then falls back to the scan-based tiers. Conservative by
    construction: overestimates, never under."""
    import os as _os
    import re as _re

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    import pyarrow.parquet as _pq

    total_rows, vmax = 0, 0.0
    for f in files:
        path = _re.sub(r"^file:(//)?", "", f)
        if not _os.path.exists(path) or not path.endswith(".parquet"):
            return None
        try:
            md = _pq.ParquetFile(path).metadata
        except Exception:
            return None
        try:
            idx = md.schema.names.index(value_col)
        except ValueError:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            vmax = max(vmax, abs(float(st.min)), abs(float(st.max)))
        total_rows += md.num_rows
    cents_max = vmax * 100.0 + 1.0
    return float(total_rows) * cents_max * cents_max

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
       round(CAST(sum(CAST(floor(e.value * 10000000 + 0.5) AS BIGINT))
                 AS DOUBLE) / 10000000, 4) AS total_value,
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
    # Range on the raw nanos long BEFORE the NTZ cast -> the predicate
    # reaches PushedFilters and prunes parquet row groups (a filter on
    # the computed ts column evaluates post-scan).
    events = load_table_in_range(
        spark, sf_dir, "events", "ts", MONTH_START, MONTH_END
    )
    users = spark.table("users")
    daily = (
        events
        .groupBy(
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            "user_id",
        )
        .agg(
            F.count("*").alias("usage_count"),
            # Per-row half-up quantization to 1e-7 units before the
            # cross-partition sum (the a2/c14/x8 discipline): rounding
            # a raw float sum is order-sensitive exactly on half
            # boundaries. Exponential-distributed values make a
            # boundary hit negligible but not impossible; quantizing
            # here keeps the flagship under the same determinism rule
            # as every other money/value rollup.
            F.round(
                F.sum(
                    F.floor(
                        F.col("value") * F.lit(1e7) + F.lit(0.5)
                    ).cast("bigint")
                ).cast("double")
                / F.lit(1e7),
                4,
            ).alias("total_value"),
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
        # No presentation sort: the result SET is the contract (the
        # gate hashes order-insensitively), and a global ORDER BY costs
        # a range exchange plus a sampling pass that re-executes the
        # aggregate+join child — at 100 TB it is a full extra shuffle
        # of the result (guide §2.4's "orderBy used only to make output
        # deterministic"); the r10 a23 rewrite set the precedent.
    )


@query(
    "a2_global_rollup",
    driver=False,
    doc="""A2: grand-total rollup, $group {_id:null, $sum, $sum}
    (controllers/trackUsageController.js:116-127).""",
    fixtures_used=("usage",),
    oracle="""
SELECT round(CAST(sum(CAST(floor(total_token_cost * 10000000 + 0.5)
                 AS BIGINT)) AS DOUBLE) / 10000000, 4) AS total_cost,
       CAST(sum(total_tokens) AS BIGINT) AS total_tokens,
       count(*) AS usage_rows
FROM usage
""",
)
def a2_global_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-row half-up quantization to 1e-7 cost units (costs are exact
    # decimal multiples of 5e-7), then an exact integer sum — the x8
    # discipline: rounding a cross-partition FLOAT sum sits on the
    # half-boundary whenever the global sum is an odd multiple of
    # 5e-5, where accumulation order could flip the driver's value
    # hash.
    q = F.floor(
        F.col("total_token_cost") * F.lit(1e7) + F.lit(0.5)
    ).cast("bigint")
    return spark.table("usage").agg(
        F.round(F.sum(q).cast("double") / F.lit(1e7), 4).alias(
            "total_cost"
        ),
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
    driver=False,
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
        # Presentation sort dropped (flagship rationale).
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
       round(CAST(sum(CAST(floor((CASE p.provider
           WHEN 'openai' THEN (u.input_token * p.input
                               + u.output_token * p.output) / 1000
           WHEN 'gemini' THEN u.input_token * p.input
                              + u.output_token * p.output
           ELSE 0.0 END) * 10000000 + 0.5) AS BIGINT)) AS DOUBLE)
           / 10000000, 6) AS recomputed_cost,
       round(CAST(sum(CAST(floor(u.total_token_cost * 10000000 + 0.5)
           AS BIGINT)) AS DOUBLE) / 10000000, 6) AS stored_cost
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
    # Same per-row quantize-then-integer-sum discipline as x8/a2:
    # per-provider cost sums are exact multiples of 5e-7, so rounding
    # a float SUM at 6 dp sits ON the half-boundary whenever the
    # token-parity is odd (true at sf0.1) and partition order decides
    # the hash.
    def q7(col):
        return F.floor(col * F.lit(1e7) + F.lit(0.5)).cast("bigint")

    return (
        joined.groupBy("provider")
        .agg(
            F.count("*").alias("n_calls"),
            F.round(F.sum(q7(cost)).cast("double") / F.lit(1e7), 6).alias(
                "recomputed_cost"
            ),
            F.round(
                F.sum(q7(F.col("total_token_cost"))).cast("double")
                / F.lit(1e7),
                6,
            ).alias("stored_cost"),
        )
        # Presentation sort dropped (flagship rationale).
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
        # Presentation sort dropped (flagship rationale).
    )


@query(
    "a4_group_collect_rows",
    driver=False,
    doc="""A4: $group with $push of row structs — templates per category
    (controllers/templateController.js:74-86); the pushed array is
    rendered as a sorted joined string for the oracle hash.""",
    fixtures_used=("assistants",),
    oracle="""
SELECT category,
       count(*) AS n,
       array_to_string(list_sort(list(name)), '|') AS names
FROM assistants
WHERE NOT is_deleted
GROUP BY category
ORDER BY category
""",
)
def a4_group_collect_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("assistants")
        .filter(~F.col("is_deleted"))
        .groupBy("category")
        .agg(
            F.count("*").alias("n"),
            F.array_join(F.array_sort(F.collect_list("name")), "|").alias(
                "names"
            ),
        )
        .orderBy("category")
    )


@query(
    "a5_count_with_predicate",
    driver=False,
    doc="""A5: countDocuments(query), >=12 call sites (e.g.
    controllers/assistantController.js:328,518;
    userController.js:54,153-157).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT count(*) AS n
FROM prompts
WHERE bot_provider = 'openai' AND NOT is_deleted AND tokenused > 1000
""",
)
def a5_count_with_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = (
        spark.table("prompts")
        .filter(
            (F.col("bot_provider") == "openai")
            & ~F.col("is_deleted")
            & (F.col("tokenused") > 1000)
        )
        .count()
    )
    # Scalar-returning operator surfaced as a 1-row DataFrame (the
    # engine convention for countDocuments-style calls).
    return spark.createDataFrame([(n,)], "n long")


@query(
    "a6_distinct",
    driver=False,
    doc="""A6: .distinct('threadid') after a filter
    (controllers/promptController.js:363-366,712-715).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT DISTINCT threadid
FROM prompts
WHERE userid = 12 AND NOT is_deleted
ORDER BY threadid
""",
)
def a6_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter((F.col("userid") == 12) & ~F.col("is_deleted"))
        .select("threadid")
        .distinct()
        .orderBy("threadid")
    )


@query(
    "a7_client_side_sum",
    driver=False,
    doc="""A7: fetch tokenused then reduce((a,b)=>a+b) client-side
    (controllers/promptController.js:568-569,683-695) => one agg(sum),
    no collect.""",
    fixtures_used=("prompts",),
    oracle="""
SELECT CAST(sum(tokenused) AS BIGINT) AS total_tokens
FROM prompts
WHERE userid = 3 AND tokenused IS NOT NULL
""",
)
def a7_client_side_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter((F.col("userid") == 3) & F.col("tokenused").isNotNull())
        .agg(F.sum("tokenused").alias("total_tokens"))
    )


@query(
    "a9_range_stats_null_model",
    driver=False,
    doc="""A9: range statistics split by model treating missing model as
    gpt-4 (controllers/promptController.js:664-707) =>
    groupBy(coalesce(modelused,'gpt-4')).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT coalesce(modelused, 'gpt-4') AS model,
       count(*) AS n,
       CAST(sum(coalesce(tokenused, 0)) AS BIGINT) AS tokens
FROM prompts
WHERE promptdate >= DATE '2024-01-05' AND promptdate < DATE '2024-01-20'
GROUP BY 1
ORDER BY model
""",
)
def a9_range_stats_null_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(
            (F.col("promptdate") >= F.lit("2024-01-05").cast("date"))
            & (F.col("promptdate") < F.lit("2024-01-20").cast("date"))
        )
        .groupBy(F.coalesce("modelused", F.lit("gpt-4")).alias("model"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("tokenused", F.lit(0))).alias("tokens"),
        )
        .orderBy("model")
    )


@query(
    "a14_emptiness_probes",
    driver=False,
    doc="""A14: init-setup invariant — four collections must all be
    empty (controllers/initController.js:38-45); here four count()==0
    probes over filtered slices. Only THREE feed clean_install: the
    superadmin count is reported but deliberately excluded from the
    conjunction (the fixture always seeds user 0 as superadmin, so
    including it would pin clean_install false) — the exclusion is
    load-bearing, mirror it in BOTH the plan and the oracle.""",
    fixtures_used=("users", "prompts", "assistants", "config"),
    oracle="""
SELECT
    (SELECT count(*) FROM users WHERE role = 'superadmin') AS n_superadmins,
    (SELECT count(*) FROM prompts WHERE tokenused < 0) AS n_negative,
    (SELECT count(*) FROM assistants WHERE category = 'UNKNOWN') AS n_unknown,
    (SELECT count(*) FROM config WHERE key = 'missing') AS n_missing,
    ((SELECT count(*) FROM prompts WHERE tokenused < 0) = 0
     AND (SELECT count(*) FROM assistants WHERE category = 'UNKNOWN') = 0
     AND (SELECT count(*) FROM config WHERE key = 'missing') = 0)
        AS clean_install
""",
)
def a14_emptiness_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_super = (
        spark.table("users").filter(F.col("role") == "superadmin").count()
    )
    n_neg = spark.table("prompts").filter(F.col("tokenused") < 0).count()
    n_unk = (
        spark.table("assistants")
        .filter(F.col("category") == "UNKNOWN")
        .count()
    )
    n_miss = spark.table("config").filter(F.col("key") == "missing").count()
    clean = n_neg == 0 and n_unk == 0 and n_miss == 0
    return spark.createDataFrame(
        [(n_super, n_neg, n_unk, n_miss, clean)],
        "n_superadmins long, n_negative long, n_unknown long, "
        "n_missing long, clean_install boolean",
    )


@query(
    "c17_max_id_keygen",
    driver=False,
    doc="""C17: SELECT MAX(id) ... nextId = maxId + 1 key generation
    (service/postgreService.js:20-29; the documented race stays out of
    the engine — this is the pure computation).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT CAST(max(prompt_id) AS BIGINT) AS max_id,
       CAST(max(prompt_id) + 1 AS BIGINT) AS next_id
FROM prompts
""",
)
def c17_max_id_keygen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.table("prompts").agg(
        F.max("prompt_id").alias("max_id"),
        (F.max("prompt_id") + 1).alias("next_id"),
    )


@query(
    "a8b_cube_usage",
    driver=False,
    doc="""A8 idiomatic upgrade (SURVEY §2.7 note): the reference's
    6-query manual model x period matrix as ONE cube(model, month) —
    all subtotal combinations in a single pass; DuckDB oracle uses the
    equivalent GROUPING SETS.""",
    fixtures_used=("prompts",),
    oracle="""
SELECT coalesce(modelused, '(null)') AS model,
       CAST(coalesce(month(promptdate), -1) AS INT) AS m,
       CAST(grouping(modelused) AS INT) AS g_model,
       CAST(grouping(month(promptdate)) AS INT) AS g_month,
       CAST(sum(coalesce(tokenused, 0)) AS BIGINT) AS tokens,
       count(*) AS n
FROM prompts
WHERE NOT is_deleted
GROUP BY CUBE (modelused, month(promptdate))
ORDER BY g_model, g_month, model, m
""",
)
def a8b_cube_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    prompts = (
        spark.table("prompts")
        .filter(~F.col("is_deleted"))
        # grouping() can only reference real grouping columns, not
        # lateral aliases — materialize the month first.
        .withColumn("m_raw", F.month("promptdate"))
    )
    return (
        prompts.cube("modelused", "m_raw")
        .agg(
            F.sum(F.coalesce("tokenused", F.lit(0))).alias("tokens"),
            F.count("*").alias("n"),
            F.grouping("modelused").cast("int").alias("g_model"),
            F.grouping("m_raw").cast("int").alias("g_month"),
        )
        .select(
            F.coalesce("modelused", F.lit("(null)")).alias("model"),
            F.coalesce("m_raw", F.lit(-1)).cast("int").alias("m"),
            "g_model",
            "g_month",
            "tokens",
            "n",
        )
        .orderBy("g_model", "g_month", "model", "m")
    )


@query(
    "u6_intersect_except",
    # Local tier since r8: rotated out (set-op family keeps its driver
    # row via u1) to make room for ann_pq_recall_suite — the new PQ
    # family earns the gate slot, the r6/r7 rotation convention.
    driver=False,
    doc="""Table-level INTERSECT/EXCEPT (engine extra — SURVEY §2.10
    notes the reference has none): users active this week vs last week
    -> retained / churned / new cohort counts.""",
    oracle="""
WITH w1 AS (
    SELECT DISTINCT user_id FROM events
    WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
),
w2 AS (
    SELECT DISTINCT user_id FROM events
    WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-22'
)
SELECT
    (SELECT count(*) FROM (SELECT * FROM w1 INTERSECT SELECT * FROM w2))
        AS retained,
    (SELECT count(*) FROM (SELECT * FROM w1 EXCEPT SELECT * FROM w2))
        AS churned,
    (SELECT count(*) FROM (SELECT * FROM w2 EXCEPT SELECT * FROM w1))
        AS new_users
""",
)
def u6_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    def week(start: str, end: str):
        return (
            load_table_in_range(spark, sf_dir, "events", "ts", start, end)
            .select("user_id")
            .distinct()
        )

    w1 = week("2024-01-08", "2024-01-15").withColumn("_w1", F.lit(1))
    w2 = week("2024-01-15", "2024-01-22").withColumn("_w2", F.lit(1))
    # One lazy plan (full outer join on the distinct cohorts + a single
    # aggregate) instead of three driver-side .count() actions:
    # INTERSECT = both marks, EXCEPT = one-sided marks.
    return w1.join(w2, "user_id", "full_outer").agg(
        F.count(
            F.when(F.col("_w1").isNotNull() & F.col("_w2").isNotNull(), 1)
        ).alias("retained"),
        F.count(
            F.when(F.col("_w1").isNotNull() & F.col("_w2").isNull(), 1)
        ).alias("churned"),
        F.count(
            F.when(F.col("_w1").isNull() & F.col("_w2").isNotNull(), 1)
        ).alias("new_users"),
    )


@query(
    "a15_approx_distinct_sketch",
    # Local-tier since r3: demoted to make room for
    # scale_deterministic_split under the driver-tier cap (the
    # aggregate family keeps driver rows via a3/a8b/a11).
    driver=False,
    doc="""Approximate distinct sketch (engine extra — the reference has
    no sketches): HyperLogLog approx_count_distinct next to the exact
    count, with the relative error asserted under the configured 2%
    rsd. The sketch is the 100 TB path for cardinality over raw ids;
    the oracle checks the exact columns and the error-bound flag.""",
    oracle="""
SELECT count(DISTINCT user_id) AS exact_users,
       count(DISTINCT event_id) AS exact_events,
       true AS hll_within_5pct
FROM events
""",
)
def a15_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = spark.table("events").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct("event_id").alias("exact_events"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.approx_count_distinct("event_id", rsd=0.02).alias("ae"),
    )
    return agg.select(
        "exact_users",
        "exact_events",
        (
            (F.abs(F.col("au") - F.col("exact_users"))
             <= 0.05 * F.col("exact_users"))
            & (F.abs(F.col("ae") - F.col("exact_events"))
               <= 0.05 * F.col("exact_events"))
        ).alias("hll_within_5pct"),
    )


@query(
    "a17_gapfill_locf",
    driver=False,
    doc="""Time-bucket gap-filling (the TimescaleDB
    time_bucket_gapfill + locf/interpolate companion to the a16
    hypertable rollup): per event_type, the dense hourly bucket grid
    over that series' observed span, with missing hours carrying
    n_events = 0, a LOCF value (last observed hourly average), and a
    LINEAR interpolation between the neighboring observed hours.
    Buckets are integer epoch-hour ids (the rollup's exact
    cross-engine arithmetic — no timestamp round trips); hourly
    averages are rounded to 4dp BEFORE interpolation and the
    interpolation replays the identical expression order on both
    engines, so parity is value-level.

    Cross-engine exactness (the `text_perplexity_bigram` / x8
    discipline, applied end to end): event values are quantized to
    INTEGER 1e-4 units PER ROW (`floor(v*1e4 + 0.5)` — one double op
    on identical inputs), hourly averages are exact integer rationals
    rounded half-up via positive-modulus floor division, and the
    interpolation is the same integer scheme — the only doubles in
    the output are exact `iv / 10000.0` conversions. Two earlier cuts
    interpolated (then averaged) in doubles and hit 5e-5 rounding
    ties between the engines (62.7087 vs 62.7088); integers cannot.

    Scale shape: one map-side-combined (type, hour) aggregate over the
    corpus; the grid is a per-type sequence explode (linear in
    span-hours, never in events); both fill passes are per-type
    ordered windows — series parallelize across the cluster, and a
    single series' window is span-hours long, not event-count
    long.""",
    oracle="""
WITH rowq AS (
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS bucket,
           CAST(floor(value * 10000 + 0.5) AS BIGINT) AS rv
    FROM events
),
hsum AS (
    SELECT event_type, bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(rv) AS BIGINT) AS siv
    FROM rowq GROUP BY 1, 2
),
hourly AS (
    -- hourly mean in 1e-4 units, exact integer round-half-up.
    SELECT event_type, bucket, n_events,
           ((2 * siv + n_events
             - (((2 * siv + n_events) % (2 * n_events) + 2 * n_events)
                % (2 * n_events)))
            // (2 * n_events)) AS iv,
           (((2 * siv + n_events
             - (((2 * siv + n_events) % (2 * n_events) + 2 * n_events)
                % (2 * n_events)))
            // (2 * n_events)) / 10000.0) AS v
    FROM hsum
),
span AS (
    SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
    FROM hourly GROUP BY 1
),
grid AS (
    SELECT event_type, CAST(t.b AS BIGINT) AS bucket
    FROM span, unnest(generate_series(lo, hi)) AS t(b)
),
filled AS (
    SELECT g.event_type, g.bucket, h.n_events, h.v, h.iv
    FROM grid g LEFT JOIN hourly h USING (event_type, bucket)
),
fwd AS (
    SELECT *,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS UNBOUNDED PRECEDING) AS locf_v,
           last_value(iv IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS UNBOUNDED PRECEDING) AS locf_iv,
           last_value(CASE WHEN v IS NOT NULL THEN bucket END
                      IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS UNBOUNDED PRECEDING) AS prev_b
    FROM filled
),
bwd AS (
    SELECT *,
           last_value(iv IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket DESC
               ROWS UNBOUNDED PRECEDING) AS next_iv,
           last_value(CASE WHEN v IS NOT NULL THEN bucket END
                      IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket DESC
               ROWS UNBOUNDED PRECEDING) AS next_b
    FROM fwd
),
frac AS (
    -- interp in 1e-4 units = num / den exactly (integers); round
    -- half-up = floor((2*num + den) / (2*den)) via positive modulus.
    SELECT event_type, bucket, n_events, v, locf_v, prev_b, next_b,
           2 * (locf_iv * (next_b - prev_b)
                + (next_iv - locf_iv) * (bucket - prev_b))
               + (next_b - prev_b) AS num2,
           2 * (next_b - prev_b) AS den2
    FROM bwd
)
SELECT event_type, bucket,
       COALESCE(n_events, 0) AS n_events,
       (v IS NOT NULL) AS observed,
       locf_v AS locf_value,
       CASE WHEN v IS NOT NULL THEN v
            ELSE ((num2 - (((num2 % den2) + den2) % den2)) // den2)
                 / 10000.0 END AS interp_value
FROM frac
ORDER BY event_type, bucket
""",
)
def a17_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.table("events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bucket = F.floor(us / F.lit(3600000000).cast("long")).cast("long")
    rv = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
    # One-long-key fold TRIED AND REVERTED (VERDICT r10 #2): folding
    # the event_type code into the bucket integer (single-LONG key ->
    # HashAggregateExec's primitive fast path) cut the aggregate
    # stage 0.59 -> 0.45 s at sf10, but deriving the code table needs
    # a distinct pre-pass that costs 0.34 s per plan build — a net
    # LOSS (memoizing the type list across builds would poison any
    # session whose events view changes under it) — and even a
    # zero-cost fold leaves sf100 at ~2.7 s vs DuckDB's 0.67 s
    # perfect-hash aggregate. The composite-key wall is a measured
    # single-node floor that a cluster parallelizes with the scan;
    # numbers in PLANS.md.
    hourly = (
        events.select(
            "event_type", bucket.alias("bucket"), rv.alias("rv")
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("rv").alias("siv"),
        )
        .withColumn(
            "iv",
            F.expr(
                "(2 * siv + n_events"
                " - (((2 * siv + n_events) % (2 * n_events)"
                "     + 2 * n_events) % (2 * n_events)))"
                " div (2 * n_events)"
            ),
        )
        .withColumn("v", F.col("iv") / F.lit(10000.0))
        .drop("siv")
    )
    span = hourly.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = span.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("bucket")
    )
    filled = grid.join(hourly, ["event_type", "bucket"], "left")
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    staged = filled.select(
        "event_type",
        "bucket",
        "n_events",
        "v",
        F.last("v", ignorenulls=True).over(w_fwd).alias("locf_v"),
        F.last("iv", ignorenulls=True).over(w_fwd).alias("locf_iv"),
        F.last(obs_bucket, ignorenulls=True).over(w_fwd).alias("prev_b"),
        F.last("iv", ignorenulls=True).over(w_bwd).alias("next_iv"),
        F.last(obs_bucket, ignorenulls=True).over(w_bwd).alias("next_b"),
    )
    # interp in 1e-4 units = num/den exactly (integers); round half-up
    # = floor((2*num + den) / (2*den)) via positive modulus — no
    # double arithmetic until the final exact /10000.0 (the first cut
    # interpolated in doubles and hit a 5e-5 rounding tie).
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.expr(
            "(({n} - ((({n} % {d}) + {d}) % {d})) div {d}) / 10000.0".format(
                n="(2 * (locf_iv * (next_b - prev_b) + (next_iv - locf_iv)"
                " * (bucket - prev_b)) + (next_b - prev_b))",
                d="(2 * (next_b - prev_b))",
            )
        )
    )
    return staged.select(
        "event_type",
        "bucket",
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        F.col("v").isNotNull().alias("observed"),
        F.col("locf_v").alias("locf_value"),
        interp.alias("interp_value"),
    ).orderBy("event_type", "bucket")


@query(
    "a20_funnel_conversion",
    # Driver tier since the late-r8 rotation (dedup_exact/j14 out) —
    # sf0.01-parity and hostile-timezone verified at promotion.
    doc="""Ordered funnel analysis (view -> click -> purchase): per
    user, the first view, the first click STRICTLY AFTER that view,
    the first purchase strictly after that click — the classic
    product-analytics sequence query. Output: one row per step with
    the surviving-user count and an integer-permille conversion from
    the previous step (integer division, cross-engine exact).

    Scale shape: ONE scan of the three step types and ONE user_id
    shuffle; the strictly-after chaining is three unbounded window
    aggregates over that single partitioning (no orderBy — frame =
    whole partition, so no sort), then a co-partitioned per-user
    collapse. Never an event-stream self-join, never a re-scan per
    step (the r9 rewrite from the 3-scan/2-join form: 6.3 s -> one
    pass at sf10); timestamps compare as integer micros.""",
    oracle="""
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
s1 AS (
    SELECT user_id, min(us) AS t1 FROM e
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.us) AS t2
    FROM e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.us > s1.t1
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.us) AS t3
    FROM e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.us > s2.t2
    GROUP BY e.user_id
),
counts AS (
    SELECT (SELECT count(*) FROM s1) AS n1,
           (SELECT count(*) FROM s2) AS n2,
           (SELECT count(*) FROM s3) AS n3
)
SELECT * FROM (
    -- NULL permille when the previous step is empty: on ANSI engines
    -- an unguarded integer division CRASHES a zero-conversion corpus
    -- (edge found by the hypothesis funnel pin in
    -- tests/test_properties.py, not by the fixtures).
    SELECT 'step_1_view' AS step, CAST(n1 AS BIGINT) AS users,
           CASE WHEN n1 > 0 THEN CAST(1000 AS BIGINT) END
               AS permille_of_prev FROM counts
    UNION ALL
    SELECT 'step_2_click', CAST(n2 AS BIGINT),
           CASE WHEN n1 > 0 THEN CAST((n2 * 1000) // n1 AS BIGINT) END
    FROM counts
    UNION ALL
    SELECT 'step_3_purchase', CAST(n3 AS BIGINT),
           CASE WHEN n2 > 0 THEN CAST((n3 * 1000) // n2 AS BIGINT) END
    FROM counts
) ORDER BY step
""",
)
def a20_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.table("events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    # One user_id partitioning serves all three steps: each t_i is an
    # unbounded min over the partition (no orderBy => no sort), and
    # t_{i+1}'s predicate reads the materialized t_i column — a user
    # missing step i has t_i NULL, which nulls the when() out of the
    # next min exactly like the inner-join form it replaces.
    w = Window.partitionBy("user_id")
    step = e.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w),
    )
    step = step.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("us") > F.col("t1")),
                F.col("us"),
            )
        ).over(w),
    )
    step = step.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("us") > F.col("t2")),
                F.col("us"),
            )
        ).over(w),
    )
    per_user = step.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    counts = per_user.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    # NULL permille when the previous step is empty — unguarded `div`
    # crashes a zero-conversion corpus under ANSI (hypothesis-found
    # edge; the fixtures always convert).
    steps = counts.selectExpr(
        """stack(3,
            'step_1_view', n1,
            CASE WHEN n1 > 0 THEN CAST(1000 AS BIGINT) END,
            'step_2_click', n2,
            CASE WHEN n1 > 0 THEN (n2 * 1000) div n1 END,
            'step_3_purchase', n3,
            CASE WHEN n2 > 0 THEN (n3 * 1000) div n2 END
        ) AS (step, users, permille_of_prev)"""
    )
    return steps.orderBy("step")


@query(
    "a21_retention_cohorts",
    driver=False,
    doc="""Weekly retention cohorts: users grouped by their FIRST
    active epoch-week, each cohort's distinct active users counted at
    every later week offset, with integer-permille retention against
    the cohort size — the standard growth-analytics matrix. Epoch-day
    and epoch-week ids are integer divisions of epoch micros, so the
    whole computation is integer-exact cross-engine.

    Scale shape (rewritten after the sf100 sweep caught 5.28x): ONE
    user_id exchange total. A single groupBy(user_id) computes both
    the first-touch min AND the distinct active weeks
    (collect_set(wk) — partial-aggregated map-side, bounded by the
    calendar: <=~2600 weeks for 50 years, KBs per user), so cohort
    week and activity come out co-located with no join at all.
    Exploding the week set yields exactly one row per distinct
    (user, week), so the cohort matrix is a plain count(*) — the
    previous plan's count(DISTINCT user_id) expansion (a second wide
    exchange over the joined activity frame) is gone. Cohort size
    falls out of the matrix itself: every user is active in their own
    cohort week, so n0 = the wk_offset=0 cell — one window over the
    tiny (weeks x offsets) frame instead of a second aggregate over
    users. sf100 (100M events): 20.2s -> measured after rewrite in
    BENCH_EXTRAS_SF100.json.""",
    oracle="""
WITH e AS (
    SELECT user_id,
           CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
    FROM events
),
first_touch AS (
    SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id
),
activity AS (SELECT DISTINCT user_id, wk FROM e),
cohort_size AS (
    SELECT cohort_wk, count(*) AS n0 FROM first_touch GROUP BY cohort_wk
),
cells AS (
    SELECT f.cohort_wk, a.wk - f.cohort_wk AS wk_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN first_touch f USING (user_id)
    GROUP BY 1, 2
)
SELECT c.cohort_wk, c.wk_offset,
       CAST(c.active_users AS BIGINT) AS active_users,
       CAST(s.n0 AS BIGINT) AS cohort_size,
       CAST((c.active_users * 1000) // s.n0 AS BIGINT)
           AS retention_permille
FROM cells c JOIN cohort_size s USING (cohort_wk)
ORDER BY cohort_wk, wk_offset
""",
)
def a21_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    wk = F.expr(
        "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000"
        " AS BIGINT)"
    )
    e = spark.table("events").select("user_id", wk.alias("wk"))
    # One exchange: per-user first touch + distinct active weeks in a
    # single aggregate (collect_set partial-aggregates map-side; the
    # set is calendar-bounded, never event-bounded).
    per_user = e.groupBy("user_id").agg(
        F.min("wk").alias("cohort_wk"),
        F.collect_set("wk").alias("wks"),
    )
    # explode -> exactly one row per distinct (user, week): the matrix
    # is a plain count, no distinct-aggregate expansion.
    cells = (
        per_user.select("cohort_wk", F.explode("wks").alias("wk"))
        .groupBy(
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("wk_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )
    # n0 = the offset-0 cell (every user is active in their own cohort
    # week); the window runs over the tiny weeks x offsets frame.
    n0 = F.sum(
        F.when(F.col("wk_offset") == 0, F.col("active_users"))
    ).over(Window.partitionBy("cohort_wk"))
    return (
        cells.withColumn("n0", n0)
        .select(
            "cohort_wk",
            "wk_offset",
            F.col("active_users").cast("long").alias("active_users"),
            F.col("n0").cast("long").alias("cohort_size"),
            F.expr("(active_users * 1000) div n0").alias(
                "retention_permille"
            ),
        )
        .orderBy("cohort_wk", "wk_offset")
    )


@query(
    "a19_exact_percentiles",
    driver=False,
    doc="""EXACT order statistics (p25/p50/p75/p99 of
    l_extendedprice) without a global sort — the two-phase
    histogram-bracket plan: (1) ONE map-side-combined histogram over
    1000-cent buckets + a cumulative window over that bounded frame
    locates, for each integer-exact rank k = ceil(q*n), the bucket
    holding the k-th smallest and its within-bucket offset; (2) only
    rows in the (at most 4) selected buckets are ranked — a window
    whose partitions are single buckets, never the corpus. Global
    work is two scans and a histogram-sized window; DuckDB's
    quantile-style global sort is exactly what this avoids at 100 TB
    (the same no-corpus-sort discipline as
    `text_quality_quantile_filter`, extended from threshold-lookup
    to exact selection).

    Everything is integer-exact: prices quantize to cents per row,
    ranks derive from integer ceil-division, and the k-th VALUE of a
    multiset is well-defined regardless of tie order, so parity is
    value-level.""",
    oracle="""
WITH c AS (
    SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
    FROM lineitem
),
n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM c),
ks AS (
    SELECT t.label, t.num, t.den,
           CAST(((t.num * cnt + t.den - 1) // t.den) AS BIGINT) AS k
    FROM n, (VALUES ('p25', 1, 4), ('p50', 1, 2),
                    ('p75', 3, 4), ('p99', 99, 100)) t(label, num, den)
),
ranked AS (
    SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c
)
SELECT ks.label, ks.k AS rank_k,
       r.cents AS value_cents,
       r.cents / 100.0 AS value
FROM ks JOIN ranked r ON r.rn = ks.k
ORDER BY ks.label
""",
)
def a19_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.expr(
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    ).alias("cents")
    c = spark.table("lineitem").select(cents)
    hist = c.groupBy(
        F.expr("cents div 1000").alias("b")
    ).agg(F.count("*").alias("cnt_b"))
    # Cumulative counts over the BOUNDED histogram frame (thousands
    # of rows at any sf — the single-partition window is histogram-
    # sized, never corpus-sized).
    w = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "b",
        "cnt_b",
        F.sum("cnt_b").over(w).alias("cum"),
        (F.sum("cnt_b").over(w) - F.col("cnt_b")).alias("cum_prev"),
        F.sum("cnt_b").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("cnt"),
    )
    qs = spark.createDataFrame(
        [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p99", 99, 100)],
        "label string, num long, den long",
    )
    targets = (
        cum.crossJoin(F.broadcast(qs))
        .withColumn(
            "k", F.expr("(num * cnt + den - 1) div den")
        )
        .filter((F.col("cum") >= F.col("k"))
                & (F.col("cum_prev") < F.col("k")))
        .select(
            "label", "k", "b", (F.col("k") - F.col("cum_prev")).alias("off")
        )
    )
    # Phase 2: rank ONLY the selected buckets' rows.
    wanted = targets.select("b").distinct()
    in_bucket = (
        c.withColumn("b", F.expr("cents div 1000"))
        .join(F.broadcast(wanted), "b")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("b").orderBy("cents")
            ),
        )
    )
    return (
        targets.join(
            in_bucket,
            (targets["b"] == in_bucket["b"])
            & (targets["off"] == in_bucket["rn"]),
        )
        .select(
            "label",
            F.col("k").alias("rank_k"),
            F.col("cents").alias("value_cents"),
            (F.col("cents") / F.lit(100.0)).alias("value"),
        )
        .orderBy("label")
    )


@query(
    "w6_scd2_intervals",
    driver=False,
    doc="""Slowly-changing-dimension Type 2 build — the warehouse
    staple that turns an event stream into VERSIONED validity
    intervals: per user, consecutive runs of the same event_type
    collapse to one version row with [valid_from, valid_to) epoch
    micros (NULL valid_to = current), a 1-based version ordinal, and
    the run's event count. Change detection is lag() over the
    ordered stream; interval closure is lead() over the change
    points — ONE user_id shuffle serves both windows and the run
    rollup (the a18 discipline), so dimensions of any width build in
    a single pass. Tie-safe ordering by (us, event_id); all integer
    micros.""",
    oracle="""
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS us, event_id
    FROM events
),
flagged AS (
    SELECT user_id, event_type, us, event_id,
           CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
runs AS (
    SELECT user_id, event_type, us,
           CAST(sum(chg) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
    FROM flagged
),
versions AS (
    SELECT user_id, version,
           min(event_type) AS event_type,
           CAST(min(us) AS BIGINT) AS valid_from,
           CAST(count(*) AS BIGINT) AS n_events
    FROM runs GROUP BY user_id, version
)
SELECT user_id, version, event_type, valid_from,
       lead(valid_from) OVER (
           PARTITION BY user_id ORDER BY version) AS valid_to,
       n_events
FROM versions
ORDER BY user_id, version
""",
)
def w6_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.table("events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("event_type").over(w)
    flagged = e.withColumn(
        "chg",
        (prev.isNull() | (prev != F.col("event_type"))).cast("long"),
    )
    runs = flagged.withColumn(
        "version",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    versions = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("event_type"),
        F.min("us").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    return versions.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        F.lead("valid_from")
        .over(Window.partitionBy("user_id").orderBy("version"))
        .alias("valid_to"),
        "n_events",
    ).orderBy("user_id", "version")


@query(
    "a19b_grouped_median",
    driver=False,
    doc="""The GROUPED form of `a19_exact_percentiles`: exact median
    of `value` per event_type, same two-phase histogram bracketing
    but with every window partitioned by the group — cumulative
    counts run over each group's bounded histogram and ranking runs
    inside each group's single selected bucket. This is the shape
    grouped order statistics take at 100 TB: no per-group sort, no
    global anything; groups parallelize and the per-group state is a
    histogram. Values quantize to 1e-4 units per row (the engine's
    integer-exact discipline), ranks are integer ceil-division.""",
    oracle="""
WITH c AS (
    SELECT event_type,
           CAST(floor(value * 10000 + 0.5) AS BIGINT) AS q
    FROM events
),
n AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
    FROM c GROUP BY event_type
),
ranked AS (
    SELECT event_type, q,
           row_number() OVER (PARTITION BY event_type ORDER BY q) AS rn
    FROM c
)
SELECT n.event_type, n.cnt,
       CAST((n.cnt + 1) // 2 AS BIGINT) AS rank_k,
       r.q / 10000.0 AS median_value
FROM n JOIN ranked r
  ON r.event_type = n.event_type AND r.rn = (n.cnt + 1) // 2
ORDER BY n.event_type
""",
)
def a19b_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = F.expr("CAST(floor(value * 10000 + 0.5) AS BIGINT)").alias("q")
    c = spark.table("events").select("event_type", q)
    hist = c.groupBy(
        "event_type", F.expr("q div 1000").alias("b")
    ).agg(F.count("*").alias("cnt_b"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "event_type",
        "b",
        "cnt_b",
        F.sum("cnt_b").over(w).alias("cum"),
        (F.sum("cnt_b").over(w) - F.col("cnt_b")).alias("cum_prev"),
        F.sum("cnt_b").over(wall).alias("cnt"),
    )
    targets = (
        cum.withColumn("k", F.expr("(cnt + 1) div 2"))
        .filter(
            (F.col("cum") >= F.col("k")) & (F.col("cum_prev") < F.col("k"))
        )
        .select(
            "event_type",
            "cnt",
            "k",
            "b",
            (F.col("k") - F.col("cum_prev")).alias("off"),
        )
    )
    in_bucket = (
        c.withColumn("b", F.expr("q div 1000"))
        .join(F.broadcast(targets.select("event_type", "b")), ["event_type", "b"])
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type", "b").orderBy("q")
            ),
        )
    )
    return (
        targets.join(
            in_bucket.select("event_type", "b", "rn", "q"),
            ["event_type", "b"],
        )
        .filter(F.col("rn") == F.col("off"))
        .select(
            "event_type",
            "cnt",
            F.col("k").alias("rank_k"),
            (F.col("q") / F.lit(10000.0)).alias("median_value"),
        )
        .orderBy("event_type")
    )


@query(
    "a18_sessionization",
    driver=False,
    doc="""Batch sessionization (gaps-and-islands): per user, events
    ordered by time split into sessions wherever the idle gap exceeds
    900 s — the BATCH analog of the reference's 15-min conversation
    TTL (controllers/conversationController.js:14,57,78; SURVEY X3
    covers the live `session_window` / `applyInPandasWithState`
    form, this is the backfill/replay form over the event log).
    Output: one row per (user, session ordinal) with event count,
    start/end epoch-micros and integer duration seconds.

    Session boundaries are order-insensitive under timestamp ties
    (a zero gap never opens a session), and all arithmetic is integer
    micros end to end, so parity is value-level.

    Scale shape: ONE hash shuffle on user_id serves both ordered
    windows (lag + running sum share the frame) and the per-session
    rollup groups within the same partitions; users parallelize
    across the cluster and no window is longer than one user's
    history. This is the canonical event-log pattern a 100 TB
    clickstream pipeline runs daily.""",
    oracle="""
WITH e AS (
    SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
flagged AS (
    SELECT user_id, us, event_id,
           CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > 900000000
                THEN 1 ELSE 0 END AS new_sess
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sessed AS (
    -- ROWS framing is order-sensitive among timestamp ties, so the
    -- running sum replays the exact (us, event_id) order the flag
    -- was computed under.
    SELECT user_id, us,
           CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(us) AS BIGINT) AS start_us,
       CAST(max(us) AS BIGINT) AS end_us,
       CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_sec
FROM sessed
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def a18_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import sessionize

    e = spark.table("events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    sessed = sessionize(
        e, key="user_id", ts_us="us", gap_us=900 * 1_000_000
    )
    return (
        sessed.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
        .withColumn(
            "duration_sec",
            F.expr("(end_us - start_us) div 1000000"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "graph_pagerank_bipartite",
    driver=False,
    doc="""PageRank (operators/graph.py) over the supplier<->part
    link structure from lineitem — the fifth value-parity iterative
    family, and the ranking companion to connected components. Three
    damped iterations (d=0.85) from the uniform start, dangling mass
    redistributed uniformly (the general kernel; this particular
    graph has none), one edges-join-ranks shuffle per iteration with
    localCheckpoint lineage truncation, 6dp ranks, top-20. The
    oracle UNROLLS the identical three iterations in SQL including
    the dangling terms.""",
    oracle="""
WITH e AS (
    SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                    'p' || CAST(l_partkey AS VARCHAR) AS dst
    FROM lineitem
    UNION
    SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR),
                    's' || CAST(l_suppkey AS VARCHAR)
    FROM lineitem
),
nodes AS (SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
c1 AS (SELECT e.dst AS node, sum(r0.r / deg.d) AS c
       FROM e JOIN r0 ON r0.node = e.src
       JOIN deg ON deg.src = e.src GROUP BY e.dst),
d1 AS (SELECT coalesce(sum(r0.r), 0) AS dm FROM r0
       LEFT JOIN deg ON deg.src = r0.node WHERE deg.src IS NULL),
r1 AS (SELECT nodes.node,
              0.15 / nn.n + 0.85 * (coalesce(c1.c, 0) + d1.dm / nn.n)
                  AS r
       FROM nodes LEFT JOIN c1 USING (node)
       CROSS JOIN d1 CROSS JOIN nn),
c2 AS (SELECT e.dst AS node, sum(r1.r / deg.d) AS c
       FROM e JOIN r1 ON r1.node = e.src
       JOIN deg ON deg.src = e.src GROUP BY e.dst),
d2 AS (SELECT coalesce(sum(r1.r), 0) AS dm FROM r1
       LEFT JOIN deg ON deg.src = r1.node WHERE deg.src IS NULL),
r2 AS (SELECT nodes.node,
              0.15 / nn.n + 0.85 * (coalesce(c2.c, 0) + d2.dm / nn.n)
                  AS r
       FROM nodes LEFT JOIN c2 USING (node)
       CROSS JOIN d2 CROSS JOIN nn),
c3 AS (SELECT e.dst AS node, sum(r2.r / deg.d) AS c
       FROM e JOIN r2 ON r2.node = e.src
       JOIN deg ON deg.src = e.src GROUP BY e.dst),
d3 AS (SELECT coalesce(sum(r2.r), 0) AS dm FROM r2
       LEFT JOIN deg ON deg.src = r2.node WHERE deg.src IS NULL),
r3 AS (SELECT nodes.node,
              0.15 / nn.n + 0.85 * (coalesce(c3.c, 0) + d3.dm / nn.n)
                  AS r
       FROM nodes LEFT JOIN c3 USING (node)
       CROSS JOIN d3 CROSS JOIN nn)
SELECT node, round(r, 6) AS rank
FROM r3
ORDER BY rank DESC, node
LIMIT 20
""",
)
def graph_pagerank_bipartite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import pagerank

    li = spark.table("lineitem").select(
        F.concat(
            F.lit("s"), F.col("l_suppkey").cast("string")
        ).alias("src"),
        F.concat(
            F.lit("p"), F.col("l_partkey").cast("string")
        ).alias("dst"),
    )
    edges = li.unionByName(
        li.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    return (
        pagerank(edges, iters=3, damping=0.85)
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


@query(
    "graph_label_communities",
    driver=False,
    doc="""Label propagation communities (operators/graph.py,
    Raghavan et al. 2007) over the supplier<->part graph: three
    synchronous rounds of adopt-the-most-frequent-neighbor-label
    with the deterministic smallest-label tie-break, reported as
    community sizes. The density companion to PageRank's centrality
    and connected components' reachability. The oracle unrolls the
    identical three argmax rounds with windowed row_numbers.""",
    oracle="""
WITH e AS (
    SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                    'p' || CAST(l_partkey AS VARCHAR) AS dst
    FROM lineitem
    UNION
    SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR),
                    's' || CAST(l_suppkey AS VARCHAR)
    FROM lineitem
),
nodes AS (SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
l0 AS (SELECT node, node AS lbl FROM nodes),
c1 AS (SELECT e.dst AS node, l0.lbl, count(*) AS cnt
       FROM e JOIN l0 ON l0.node = e.src GROUP BY 1, 2),
p1 AS (SELECT node, lbl FROM (
    SELECT node, lbl, row_number() OVER (
        PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
    FROM c1) WHERE rn = 1),
l1 AS (SELECT l.node, coalesce(p.lbl, l.lbl) AS lbl
       FROM l0 l LEFT JOIN p1 p USING (node)),
c2 AS (SELECT e.dst AS node, l1.lbl, count(*) AS cnt
       FROM e JOIN l1 ON l1.node = e.src GROUP BY 1, 2),
p2 AS (SELECT node, lbl FROM (
    SELECT node, lbl, row_number() OVER (
        PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
    FROM c2) WHERE rn = 1),
l2 AS (SELECT l.node, coalesce(p.lbl, l.lbl) AS lbl
       FROM l1 l LEFT JOIN p2 p USING (node)),
c3 AS (SELECT e.dst AS node, l2.lbl, count(*) AS cnt
       FROM e JOIN l2 ON l2.node = e.src GROUP BY 1, 2),
p3 AS (SELECT node, lbl FROM (
    SELECT node, lbl, row_number() OVER (
        PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
    FROM c3) WHERE rn = 1),
l3 AS (SELECT l.node, coalesce(p.lbl, l.lbl) AS lbl
       FROM l2 l LEFT JOIN p3 p USING (node))
SELECT lbl AS community, count(*) AS n_members
FROM l3
GROUP BY 1
ORDER BY n_members DESC, community
LIMIT 20
""",
)
def graph_label_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.graph import label_propagation

    li = spark.table("lineitem").select(
        F.concat(
            F.lit("s"), F.col("l_suppkey").cast("string")
        ).alias("src"),
        F.concat(
            F.lit("p"), F.col("l_partkey").cast("string")
        ).alias("dst"),
    )
    edges = li.unionByName(
        li.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    )
    return (
        label_propagation(edges, iters=3)
        .groupBy(F.col("lbl").alias("community"))
        .agg(F.count("*").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


@query(
    "a23_rolling_anomaly",
    driver=False,
    doc="""Trailing-window anomaly detection over the event stream:
    per user, each event's value scores a z-statistic against the
    PRECEDING 20 events' mean/sample-stddev (never its own row — no
    self-contamination), flagged when the 4dp-rounded z clears 2.0
    with at least 10 prior observations. The streaming-shaped
    outlier gate a training-data feed runs before ingest; one
    user_id shuffle, integer epoch-micros ordering with event_id
    tie-break (the a18 discipline) keeps the frame engine-identical.

    Integer-exact contract (the a19 discipline, adopted after the
    sf100 sweep caught 4.39x): values quantize to int64 cents per
    row, and the trailing sum/sum-of-squares come from CUMULATIVE
    integer sums differenced by lag — exact in int64 (no float
    cancellation is possible; range: the per-user running
    sum-of-squares is rows/user * max_cents^2, ~1e13 at 1e3
    events/user and 1e5 cents, five decades inside BIGINT — and the
    range is ENFORCED, not assumed: parquet footer stats bound the
    corpus with zero jobs in the common case, escalating to a global
    sum-of-squares scan and then a per-user max only as each cheaper
    tier fails to prove safety, and raise a named OverflowError
    before Spark's non-ANSI int64 sums could wrap silently against
    the HUGEINT-promoting oracle), so
    mu/sd/z are double expressions over identical exact integers on
    both engines and parity is value-level. The running sums
    0-coalesce NULL values (a NULL row must not poison every later
    lag difference — sum over an all-NULL prefix is NULL and lag
    propagates values, not defaults; zeros are exact under the
    n >= 10 gate since the count tracks only non-NULLs — edge found
    by the hypothesis algebra pin in tests/test_properties.py). Plan shape: the naive ROWS BETWEEN 20 PRECEDING
    frame makes Spark's WindowExec re-aggregate all 20 frame rows
    per output row per function (~6e9 updates at 100M events —
    measured 14s of the 18s wall); running totals + lag are
    incremental O(1)/row in the SAME window sort, and the flagged
    output needs no presentation sort (the gate's compare is
    row-order-insensitive; a global sort's range-sampler would
    re-execute the whole window). sf100: 36.6s -> measured after
    rewrite in BENCH_EXTRAS_SF100.json.""",
    oracle="""
WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS us, value,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
),
cum AS (
    -- coalesce-0 inside the running sums: a NULL value row must not
    -- poison every later lag difference in its partition (sum over an
    -- all-NULL prefix is NULL, and lag() propagates values, not
    -- defaults); zeros are exact under the n >= 10 gate since cc
    -- counts only non-NULLs.
    SELECT user_id, event_id, us, value, cents,
           sum(coalesce(cents, 0)) OVER w AS cs,
           sum(coalesce(cents * cents, 0)) OVER w AS csq,
           count(cents) OVER w AS cc
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
lagged AS (
    SELECT user_id, event_id, value, cents,
           lag(cs, 1, CAST(0 AS BIGINT)) OVER o
             - lag(cs, 21, CAST(0 AS BIGINT)) OVER o AS s,
           lag(csq, 1, CAST(0 AS BIGINT)) OVER o
             - lag(csq, 21, CAST(0 AS BIGINT)) OVER o AS ssq,
           lag(cc, 1, CAST(0 AS BIGINT)) OVER o
             - lag(cc, 21, CAST(0 AS BIGINT)) OVER o AS n
    FROM cum
    WINDOW o AS (PARTITION BY user_id ORDER BY us, event_id)
),
scored AS (
    SELECT user_id, event_id, value, n,
           (CAST(ssq AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1.0) AS var_,
           CAST(cents AS DOUBLE)
             - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS dev
    FROM lagged
    WHERE n >= 10
)
SELECT user_id, event_id, value,
       round(dev / sqrt(var_), 4) AS z
FROM scored
WHERE var_ > 0 AND round(dev / sqrt(var_), 4) >= 2.0
""",
)
def a23_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    wc = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = spark.table("events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    # Int64-range enforcement (not just documentation): the cumulative
    # csq is an UNBOUNDED-preceding sum of cents^2 per user — Spark's
    # sum(bigint) WRAPS silently under non-ANSI while the DuckDB
    # oracle promotes to HUGEINT, so past the documented range the
    # engines would silently diverge. Three tiers, cheapest first,
    # each exact-enough in double (threshold 2^62 leaves a full bit
    # of FP margin below 2^63): (0) parquet FOOTER stats alone —
    # n_rows * max(|value|)^2 in cents, zero Spark jobs, the same
    # metadata discipline as the FK stats pruning — proves the common
    # case safe without touching data; (1) one map-side-combined
    # global sum of cents^2 — if even the ALL-users total is in
    # range, every per-user prefix is; (2) only if that trips, a
    # per-user max (one extra shuffle) decides whether any single
    # user actually overflows, and only then does the plan refuse
    # with a named error instead of a wrong answer.
    _csq_bound = float(1 << 62)
    _c2 = F.col("cents").cast("double") * F.col("cents").cast("double")
    _footer = _csq_footer_bound(spark.table("events"), "value")
    if _footer is not None and _footer < _csq_bound:
        _gtot = None  # footers prove the whole corpus safe: no job
    else:
        _gtot = e.select(F.sum(_c2).alias("g")).first()["g"]
    if _gtot is not None and _gtot >= _csq_bound:
        _umax = (
            e.groupBy("user_id")
            .agg(F.sum(_c2).alias("u"))
            .select(F.max("u").alias("m"))
            .first()["m"]
        )
        if _umax is not None and _umax >= _csq_bound:
            raise OverflowError(
                "a23_rolling_anomaly: a user's cumulative "
                "sum-of-squared-cents reaches "
                f"{_umax:.3e} >= 2^62 — the int64 running sums would "
                "wrap silently (the DuckDB oracle promotes to "
                "HUGEINT and would not); rescale the value column "
                "or shard the stream before scoring"
            )
    cum = e.select(
        "user_id",
        "event_id",
        "us",
        "value",
        "cents",
        F.sum(F.coalesce(F.col("cents"), F.lit(0))).over(wc).alias("cs"),
        F.sum(F.coalesce(F.col("cents") * F.col("cents"), F.lit(0)))
        .over(wc)
        .alias("csq"),
        F.count("cents").over(wc).alias("cc"),
    )
    lagged = cum.select(
        "user_id",
        "event_id",
        "value",
        "cents",
        (
            F.lag("cs", 1, 0).over(wo) - F.lag("cs", 21, 0).over(wo)
        ).alias("s"),
        (
            F.lag("csq", 1, 0).over(wo) - F.lag("csq", 21, 0).over(wo)
        ).alias("ssq"),
        (
            F.lag("cc", 1, 0).over(wo) - F.lag("cc", 21, 0).over(wo)
        ).alias("n"),
    )
    nd = F.col("n").cast("double")
    var_ = (
        F.col("ssq").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (nd - F.lit(1.0))
    dev = F.col("cents").cast("double") - F.col("s").cast("double") / nd
    scored = lagged.where(F.col("n") >= 10).select(
        "user_id",
        "event_id",
        "value",
        var_.alias("var_"),
        dev.alias("dev"),
    )
    z = F.round(F.col("dev") / F.sqrt("var_"), 4)
    return scored.where((F.col("var_") > 0) & (z >= 2.0)).select(
        "user_id", "event_id", "value", z.alias("z")
    )
