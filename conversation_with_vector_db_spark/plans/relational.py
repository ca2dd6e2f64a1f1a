"""Relational core: filters, projections, sorts/pagination, set ops,
window-shaped computations (SURVEY §2.4, §2.5, §2.8, §2.9, §2.10).

Every query is a pure declarative plan: predicates land in the parquet
scan (pushdown), projections prune columns, and sorts with LIMIT lower
to TakeOrderedAndProject — no driver-side loops anywhere. Pagination
quirks of the reference (skip-only, +3 offset, keyset cursors) are
reproduced faithfully.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.filters import build_filter
from .registry import query

# ---------------------------------------------------------------------------
# §2.4 Filters / predicates
# ---------------------------------------------------------------------------


@query(
    "f1_equality_filter",
    driver=False,
    doc="""F1: {userid: custUserId} equality scan
    (controllers/promptController.js:248).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT prompt_id, threadid, userid, tokenused
FROM prompts WHERE userid = 42 ORDER BY prompt_id
""",
)
def f1_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(F.col("userid") == 42)
        .select("prompt_id", "threadid", "userid", "tokenused")
        .orderBy("prompt_id")
    )


@query(
    "f2_conjunctive_flag",
    driver=False,
    doc="""F2: {threadid, isDeleted:false} conjunction
    (controllers/promptController.js:269-270).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT prompt_id, threadid, description
FROM prompts
WHERE threadid = 't7-1' AND NOT is_deleted
ORDER BY prompt_id
""",
)
def f2_conjunctive_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter((F.col("threadid") == "t7-1") & ~F.col("is_deleted"))
        .select("prompt_id", "threadid", "description")
        .orderBy("prompt_id")
    )


@query(
    "f4_date_range_on_date",
    driver=False,
    doc="""F4: promptdate {$gte,$lt} range over a date-typed column
    (controllers/promptController.js:554-567).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT count(*) AS n,
       CAST(sum(tokenused) AS BIGINT) AS tokens
FROM prompts
WHERE promptdate >= DATE '2024-01-08' AND promptdate < DATE '2024-01-15'
  AND tokenused IS NOT NULL
""",
)
def f4_date_range_on_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(
            (F.col("promptdate") >= F.lit("2024-01-08").cast("date"))
            & (F.col("promptdate") < F.lit("2024-01-15").cast("date"))
            & F.col("tokenused").isNotNull()
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("tokenused").alias("tokens"),
        )
    )


@query(
    "f5_exists_missing_field",
    driver=False,
    doc="""F5: $exists true/false — NULL-ness counts for tokenused /
    modelused / deleted_email (promptController.js:556,560-563;
    userController.js:36).""",
    fixtures_used=("prompts", "users"),
    oracle="""
SELECT
    (SELECT count(*) FROM prompts WHERE tokenused IS NOT NULL)
        AS with_tokens,
    (SELECT count(*) FROM prompts WHERE modelused IS NULL)
        AS missing_model,
    (SELECT count(*) FROM users WHERE deleted_email IS NULL)
        AS not_deleted_users
""",
)
def f5_exists_missing_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    prompts = spark.table("prompts")
    users = spark.table("users")
    a = prompts.agg(
        F.sum(F.when(F.col("tokenused").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("with_tokens"),
        F.sum(F.when(F.col("modelused").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("missing_model"),
    )
    b = users.agg(
        F.sum(F.when(F.col("deleted_email").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("not_deleted_users")
    )
    return a.crossJoin(b)


@query(
    "f6_negation",
    driver=False,
    doc="""F6: role {$ne:'superadmin'} (controllers/userController.js:35).""",
    fixtures_used=("users",),
    oracle="""
SELECT role, count(*) AS n
FROM users WHERE role <> 'superadmin'
GROUP BY role ORDER BY role
""",
)
def f6_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("users")
        .filter(F.col("role") != "superadmin")
        .groupBy("role")
        .agg(F.count("*").alias("n"))
        .orderBy("role")
    )


@query(
    "f7_set_membership",
    driver=False,
    doc="""F7: threadid {$in: ids} (controllers/promptController.js:771,796;
    userController.js:582).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT threadid, count(*) AS n
FROM prompts
WHERE threadid IN ('t1-0', 't2-3', 't3-6', 't5-2')
GROUP BY threadid ORDER BY threadid
""",
)
def f7_set_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(F.col("threadid").isin("t1-0", "t2-3", "t3-6", "t5-2"))
        .groupBy("threadid")
        .agg(F.count("*").alias("n"))
        .orderBy("threadid")
    )


@query(
    "f8_regex_case_insensitive",
    driver=False,
    doc="""F8: {email: {$regex: search, $options:'i'}}
    (controllers/userController.js:29-31;
    assistantController.js:324-326). Two fixed mixed-case probes via
    the (?i) flag — never lower() on the pattern, which would invert
    uppercase class shorthands like \\S.""",
    fixtures_used=("users",),
    oracle="""
SELECT email FROM users
WHERE regexp_matches(email, '(?i)CUSTomer#0000001')
   OR regexp_matches(email, '(?i)0999')
ORDER BY email
""",
)
def f8_regex_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = spark.table("users")
    return (
        users.filter(
            F.col("email").rlike("(?i)CUSTomer#0000001")
            | F.col("email").rlike("(?i)0999")
        )
        .select("email")
        .orderBy("email")
    )


@query(
    "f9_role_disjunction",
    driver=False,
    doc="""F9: role/team-dependent $or — organizational assistants of a
    team OR personal assistants of a user
    (controllers/assistantController.js:574-601).""",
    fixtures_used=("assistants",),
    oracle="""
SELECT assistant_id, name, category
FROM assistants
WHERE NOT is_deleted
  AND ((category = 'ORGANIZATIONAL' AND team_id = 7)
       OR (category = 'PERSONAL' AND user_id = 33))
ORDER BY assistant_id
""",
)
def f9_role_disjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("assistants")
        .filter(
            ~F.col("is_deleted")
            & (
                ((F.col("category") == "ORGANIZATIONAL") & (F.col("team_id") == 7))
                | ((F.col("category") == "PERSONAL") & (F.col("user_id") == 33))
            )
        )
        .select("assistant_id", "name", "category")
        .orderBy("assistant_id")
    )


@query(
    "f10_or_with_missing",
    driver=False,
    doc="""F10: $or of {$exists:false} and equality —
    {modelused missing} OR {modelused:'gpt-4'}
    (controllers/promptController.js:558-565,679-682).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT count(*) AS n, CAST(sum(coalesce(tokenused, 0)) AS BIGINT) AS tokens
FROM prompts
WHERE modelused IS NULL OR modelused = 'gpt-4'
""",
)
def f10_or_with_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(F.col("modelused").isNull() | (F.col("modelused") == "gpt-4"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("tokenused", F.lit(0))).alias("tokens"),
        )
    )


@query(
    "f12_dynamic_filter_builder",
    # r8 rotation: to local parity (F keeps its driver rows via the
    # flagship F3 and f11) — ann_bq_hamming_topk promoted in.
    driver=False,
    doc="""F12: generic query-by-example with gt|gte|lt|lte|regex
    operator rewrite (controllers/organizationController.js:95-128),
    compiled by operators.filters.build_filter into ONE Catalyst
    predicate (still pushed down to the scan).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT prompt_id, userid, tokenused, modelused
FROM prompts
WHERE tokenused >= 500 AND tokenused < 2000
  AND modelused IN ('gpt-4', 'gemini-pro')
  AND regexp_matches(description, '(?i)purchase')
ORDER BY prompt_id
""",
)
def f12_dynamic_filter_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = {
        "tokenused": {"gte": 500, "lt": 2000},
        "modelused": {"in": ["gpt-4", "gemini-pro"]},
        "description": {"regex": "purchase"},
    }
    return (
        spark.table("prompts")
        .filter(build_filter(spec))
        .select("prompt_id", "userid", "tokenused", "modelused")
        .orderBy("prompt_id")
    )


@query(
    "f13_mixed_or_on_id",
    driver=False,
    doc="""F13: $or over two id fields
    (service/favoriteAssistantService.js:14-16).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT prompt_id, userid FROM prompts
WHERE prompt_id = 77 OR userid = 77
ORDER BY prompt_id
""",
)
def f13_mixed_or_on_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter((F.col("prompt_id") == 77) | (F.col("userid") == 77))
        .select("prompt_id", "userid")
        .orderBy("prompt_id")
    )


@query(
    "f14_key_set_filter",
    driver=False,
    doc="""F14: config.find({key: {$in: keys}})
    (controllers/configController.js:394-421).""",
    fixtures_used=("config",),
    oracle="""
SELECT key, value FROM config
WHERE key IN ('temperature', 'model', 'tokens')
ORDER BY key
""",
)
def f14_key_set_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("config")
        .filter(F.col("key").isin("temperature", "model", "tokens"))
        .orderBy("key")
    )


@query(
    "f15_recency_filter",
    driver=False,
    doc="""F15: cron recency filter createdAt >= yesterday-midnight
    (service/cronEmailService.js:7-9) — anchored at a fixed 'today'
    (2024-01-30) per FIXTURES.md determinism rules.""",
    oracle="""
SELECT event_type, count(*) AS n, round(sum(value), 4) AS total
FROM events
WHERE ts >= TIMESTAMP '2024-01-29 00:00:00'
  AND ts < TIMESTAMP '2024-01-30 00:00:00'
GROUP BY event_type ORDER BY event_type
""",
)
def f15_recency_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import load_table_in_range

    return (
        load_table_in_range(
            spark, sf_dir, "events", "ts", "2024-01-29", "2024-01-30"
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# §2.5 Projections
# ---------------------------------------------------------------------------


@query(
    "p1_column_exclusion",
    driver=False,
    doc="""P1: select('-password') — column drop
    (controllers/userController.js:44,213). Email plays the excluded
    secret; verify it is absent from the output schema.""",
    fixtures_used=("users",),
    oracle="""
SELECT user_id, fname, lname, role, status
FROM users WHERE user_id < 50 ORDER BY user_id
""",
)
def p1_column_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("users")
        .filter(F.col("user_id") < 50)
        .drop("email", "deleted_email", "company_id", "max_user_tokens")
        .orderBy("user_id")
    )


@query(
    "p2_single_column",
    driver=False,
    doc="""P2: single-column select('tokenused')
    (controllers/promptController.js:568,683,691).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT tokenused FROM prompts
WHERE tokenused IS NOT NULL AND userid = 7
ORDER BY tokenused
""",
)
def p2_single_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(F.col("tokenused").isNotNull() & (F.col("userid") == 7))
        .select("tokenused")
        .orderBy("tokenused")
    )


@query(
    "p4_computed_size",
    driver=False,
    doc="""P4: computed projection promptsCount {$size:'$prompts'}
    (controllers/userController.js:129-147) — the array-size projection
    over the correlated sub-lookup, as group-then-size.""",
    fixtures_used=("users", "prompts"),
    oracle="""
SELECT u.user_id AS user_id,
       count(p.prompt_id) AS prompts_count
FROM users u LEFT JOIN prompts p ON p.userid = u.user_id
WHERE u.user_id < 30
GROUP BY u.user_id
ORDER BY u.user_id
""",
)
def p4_computed_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = spark.table("users").filter(F.col("user_id") < 30)
    prompts = spark.table("prompts")
    nested = users.join(
        prompts, prompts.userid == users.user_id, "left"
    ).groupBy("user_id").agg(
        # count(col) = the oracle's NULL-skipping count(p.prompt_id) —
        # a plain map-side-combinable aggregate; building a per-group
        # array just to size it would buffer every id per user (and
        # collect_list already drops NULLs, making an isNotNull filter
        # over it dead code).
        F.count("prompt_id").alias("prompts_count")
    )
    return nested.orderBy("user_id")


@query(
    "p7_ifnull_array_elem",
    driver=False,
    doc="""P7: $addFields with $ifNull + $arrayElemAt 0 — first joined
    assistant's name else default (service/assistantService.js:142-147).""",
    fixtures_used=("assistants", "users"),
    oracle="""
WITH firsts AS (
    SELECT user_id, min(name) AS first_name
    FROM assistants WHERE NOT is_deleted
    GROUP BY user_id
)
SELECT u.user_id AS user_id,
       coalesce(f.first_name, '(none)') AS assistant_name
FROM users u LEFT JOIN firsts f ON f.user_id = u.user_id
WHERE u.user_id < 40
ORDER BY u.user_id
""",
)
def p7_ifnull_array_elem(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = spark.table("users").filter(F.col("user_id") < 40)
    firsts = (
        spark.table("assistants")
        .filter(~F.col("is_deleted"))
        .groupBy("user_id")
        .agg(F.min("name").alias("first_name"))
    )
    return (
        users.join(F.broadcast(firsts), "user_id", "left")
        .select(
            "user_id",
            F.coalesce("first_name", F.lit("(none)")).alias("assistant_name"),
        )
        .orderBy("user_id")
    )


@query(
    "p8_kv_pivot",
    doc="""P8: config key/value rows pivoted to one wide object
    (controllers/configController.js:429-432) via groupBy().pivot().""",
    fixtures_used=("config",),
    oracle="""
SELECT
    max(CASE WHEN key = 'temperature' THEN value END) AS temperature,
    max(CASE WHEN key = 'tokens' THEN value END)      AS tokens,
    max(CASE WHEN key = 'model' THEN value END)       AS model,
    max(CASE WHEN key = 'top_p' THEN value END)       AS top_p
FROM config
""",
)
def p8_kv_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("config")
        .groupBy()
        .pivot("key", ["temperature", "tokens", "model", "top_p"])
        # max, not first: first() is pick-any under parallelism, and
        # the oracle's max(CASE...) is deterministic if a key ever had
        # duplicate rows.
        .agg(F.max("value"))
    )


@query(
    "p9_row_reshape",
    driver=False,
    doc="""P9: meeting-summary row reshaping map — concat + date format
    (utils/assistant.js:153-160).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT prompt_id,
       strftime(created_at, '%Y-%m-%d') || ' | ' || description
           AS summary_line
FROM prompts WHERE userid = 11
ORDER BY prompt_id
""",
)
def p9_row_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(F.col("userid") == 11)
        .select(
            "prompt_id",
            F.concat_ws(
                " | ",
                F.date_format("created_at", "yyyy-MM-dd"),
                F.col("description"),
            ).alias("summary_line"),
        )
        .orderBy("prompt_id")
    )


# ---------------------------------------------------------------------------
# §2.8 Window-shaped computations
# ---------------------------------------------------------------------------


@query(
    "w1_first_row_per_thread",
    doc="""W1/J12: latest prompt per thread — the reference loops
    distinct threadids and findOne's each (promptController.js:363-370);
    here one row_number window, no N+1.""",
    fixtures_used=("prompts",),
    oracle="""
SELECT threadid, prompt_id, created_at
FROM (
    SELECT threadid, prompt_id, created_at,
           row_number() OVER (
               PARTITION BY threadid
               ORDER BY created_at DESC, prompt_id DESC) AS rn
    FROM prompts WHERE NOT is_deleted
) WHERE rn = 1
ORDER BY threadid
""",
)
def w1_first_row_per_thread(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("threadid").orderBy(
        F.desc("created_at"), F.desc("prompt_id")
    )
    return (
        spark.table("prompts")
        .filter(~F.col("is_deleted"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("threadid", "prompt_id", "created_at")
        # Presentation sort dropped (r11): the gate hashes
        # order-insensitively and the ORDER BY cost a range exchange.
    )


@query(
    "w2_last6_history_window",
    driver=False,
    doc="""W2: last-6-message history per conversation, re-sorted
    ascending for the prompt context (service/gptPromptService.js:11-37;
    slice(-6) at geminiAiPromptService.js:12-25).""",
    fixtures_used=("conversations",),
    oracle="""
SELECT conversation_id, ts, sender, message
FROM (
    SELECT conversation_id, ts, sender, message,
           row_number() OVER (
               PARTITION BY conversation_id
               ORDER BY ts DESC, message DESC) AS rn
    FROM conversations
) WHERE rn <= 6 AND conversation_id IN ('c3-0', 'c3-1', 'c14-2')
ORDER BY conversation_id, ts, message
""",
)
def w2_last6_history_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("conversation_id").orderBy(
        F.desc("ts"), F.desc("message")
    )
    return (
        spark.table("conversations")
        .filter(F.col("conversation_id").isin("c3-0", "c3-1", "c14-2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 6)
        .select("conversation_id", "ts", "sender", "message")
        .orderBy("conversation_id", "ts", "message")
    )


@query(
    "w4_running_token_count",
    driver=False,
    doc="""W4/A11: running token total per user ordered by time — the
    streaming tokenCount++ (sockets/chat/chatServices.js:34) and budget
    decrement (service/userService.js:31-49) as a cumulative window.""",
    fixtures_used=("prompts",),
    oracle="""
SELECT prompt_id, userid,
       CAST(sum(coalesce(tokenused, 0)) OVER (
           PARTITION BY userid
           ORDER BY created_at, prompt_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running_tokens
FROM prompts
WHERE userid < 10
ORDER BY userid, prompt_id
""",
)
def w4_running_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("userid")
        .orderBy("created_at", "prompt_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spark.table("prompts")
        .filter(F.col("userid") < 10)
        .select(
            "prompt_id",
            "userid",
            F.sum(F.coalesce("tokenused", F.lit(0)))
            .over(w)
            .alias("running_tokens"),
        )
        .orderBy("userid", "prompt_id")
    )


# ---------------------------------------------------------------------------
# §2.9 Sorts / limits / pagination
# ---------------------------------------------------------------------------


@query(
    "o1_sort_skip_limit",
    driver=False,
    doc="""O1: sort desc by createdAt + skip/limit pagination, page 3 of
    size 10 (controllers/assistantController.js:331-341;
    userController.js:43-47; pattern x15). Unique (created_at,
    prompt_id) sort key keeps pages deterministic.""",
    fixtures_used=("prompts",),
    oracle="""
SELECT prompt_id, threadid, created_at
FROM prompts
ORDER BY created_at DESC, prompt_id DESC
LIMIT 10 OFFSET 20
""",
)
def o1_sort_skip_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .orderBy(F.desc("created_at"), F.desc("prompt_id"))
        .select("prompt_id", "threadid", "created_at")
        .offset(20)
        .limit(10)
    )


@query(
    "o2_two_key_sort",
    driver=False,
    doc="""O2: {is_pinned:-1, createdAt:-1} two-key sort
    (controllers/assistantController.js:604-608), pinned first.""",
    fixtures_used=("assistants",),
    oracle="""
SELECT assistant_id, name, is_pinned
FROM assistants
WHERE NOT is_deleted
ORDER BY is_pinned DESC, assistant_id DESC
LIMIT 20
""",
)
def o2_two_key_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("assistants")
        .filter(~F.col("is_deleted"))
        .orderBy(F.desc("is_pinned"), F.desc("assistant_id"))
        .select("assistant_id", "name", "is_pinned")
        .limit(20)
    )


@query(
    "o6_offset_quirk",
    driver=False,
    doc="""O5+O6: the reference's skip((page-1)*size + 3) arithmetic
    (controllers/assistantController.js:669) and skip-without-limit
    (:468-469) reproduced faithfully: page 2, size 10 -> offset 13,
    no limit.""",
    fixtures_used=("assistants",),
    oracle="""
SELECT assistant_id, name
FROM assistants
ORDER BY assistant_id
OFFSET 13
""",
)
def o6_offset_quirk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("assistants")
        .orderBy("assistant_id")
        .select("assistant_id", "name")
        .offset((2 - 1) * 10 + 3)
    )


@query(
    "o7_keyset_pagination",
    doc="""O7: cursor pagination — after=<id>, limit n+1 to compute
    has_more (controllers/assistantController.js:707-713,759-763).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT prompt_id, threadid
FROM prompts
WHERE prompt_id > 150
ORDER BY prompt_id
LIMIT 11
""",
)
def o7_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    page_size = 10
    return (
        spark.table("prompts")
        .filter(F.col("prompt_id") > 150)
        .orderBy("prompt_id")
        .select("prompt_id", "threadid")
        .limit(page_size + 1)
    )


@query(
    "o8_paging_metadata",
    driver=False,
    doc="""O8: totalPages = ceil(count/limit)
    (controllers/assistantController.js:614;
    organizationController.js:138).""",
    fixtures_used=("prompts",),
    oracle="""
SELECT count(*) AS total,
       CAST(ceil(count(*) / 10.0) AS BIGINT) AS total_pages
FROM prompts WHERE NOT is_deleted
""",
)
def o8_paging_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(~F.col("is_deleted"))
        .agg(F.count("*").alias("total"))
        .select(
            "total",
            F.ceil(F.col("total") / 10.0).alias("total_pages"),
        )
    )


# ---------------------------------------------------------------------------
# §2.10 Set operations
# ---------------------------------------------------------------------------


@query(
    "u1_union_heterogeneous",
    doc="""U1/J11: UNION ALL of two heterogeneous thread lists — prompt
    threads and assistant threads with different columns
    (controllers/promptController.js:371-375), via unionByName with
    allowMissingColumns.""",
    fixtures_used=("prompts",),
    oracle="""
SELECT threadid, source, modelused FROM (
    SELECT DISTINCT threadid, 'prompt' AS source, modelused
    FROM prompts WHERE bot_provider = 'openai' AND modelused IS NOT NULL
    UNION ALL
    SELECT DISTINCT threadid, 'assistant' AS source, NULL AS modelused
    FROM prompts WHERE bot_provider = 'gemini'
)
ORDER BY threadid, source, modelused
""",
)
def u1_union_heterogeneous(spark: SparkSession, sf_dir: str) -> DataFrame:
    prompts = spark.table("prompts")
    a = (
        prompts.filter(
            (F.col("bot_provider") == "openai")
            & F.col("modelused").isNotNull()
        )
        .select("threadid", "modelused")
        .distinct()
        .withColumn("source", F.lit("prompt"))
    )
    b = (
        prompts.filter(F.col("bot_provider") == "gemini")
        .select("threadid")
        .distinct()
        .withColumn("source", F.lit("assistant"))
    )
    return a.unionByName(b, allowMissingColumns=True).select(
        "threadid", "source", "modelused"
    ).orderBy("threadid", "source", "modelused")


@query(
    "u4_anti_set_delete",
    driver=False,
    doc="""U4/M3: deleteMany({assistant_id in ids}) as a left-anti join
    rewrite (service/favoriteAssistantService.js:25-27) — surviving
    rows after hard delete.""",
    fixtures_used=("favorites",),
    oracle="""
SELECT assistant_id, count(*) AS n
FROM favorites
WHERE assistant_id NOT IN ('asst_3', 'asst_17', 'asst_42')
GROUP BY assistant_id
ORDER BY assistant_id
LIMIT 25
""",
)
def u4_anti_set_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    favorites = spark.table("favorites")
    doomed = spark.createDataFrame(
        [("asst_3",), ("asst_17",), ("asst_42",)], ["assistant_id"]
    )
    return (
        favorites.join(F.broadcast(doomed), "assistant_id", "left_anti")
        .groupBy("assistant_id")
        .agg(F.count("*").alias("n"))
        .orderBy("assistant_id")
        .limit(25)
    )


@query(
    "u5_array_except",
    driver=False,
    doc="""U5+U2+U3: array minus / de-dup add / membership
    (utils/assistant.js:301-316; userController.js:586-596) — arrays
    built per-thread from prompt models: collect_set, array_except,
    array_contains, rendered as a sorted joined string so the oracle is
    portable.""",
    fixtures_used=("prompts",),
    oracle="""
SELECT threadid,
       array_to_string(
           list_sort(list_distinct(list(modelused))), ',') AS models,
       array_to_string(
           list_sort(list_filter(list_distinct(list(modelused)),
                                 m -> m <> 'gpt-4')), ',') AS models_minus,
       bool_or(modelused = 'gpt-4') AS has_gpt4
FROM prompts
WHERE modelused IS NOT NULL AND userid < 5
GROUP BY threadid
ORDER BY threadid
""",
)
def u5_array_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(F.col("modelused").isNotNull() & (F.col("userid") < 5))
        .groupBy("threadid")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("modelused")), ","
            ).alias("models"),
            F.array_join(
                F.array_sort(
                    F.array_except(
                        F.collect_set("modelused"), F.array(F.lit("gpt-4"))
                    )
                ),
                ",",
            ).alias("models_minus"),
            F.max(F.col("modelused") == "gpt-4").alias("has_gpt4"),
        )
        .orderBy("threadid")
    )


@query(
    "f3_month_window",
    # Local tier since late r4 (rotated out for text_perplexity_bigram;
    # the flagship is the driver-green month-window/pushdown
    # representative, and the F family keeps f11 + f12).
    driver=False,
    doc="""F3: createdAt {$gte: startOfMonth, $lt: endOfMonth} date
    bucketing (controllers/trackUsageController.js:42-59,160-180) —
    fixed-literal month window, per-day counts.""",
    oracle="""
SELECT CAST(day(ts) AS INT) AS d, count(*) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
GROUP BY 1 ORDER BY d
""",
)
def f3_month_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import load_table_in_range

    return (
        load_table_in_range(
            spark, sf_dir, "events", "ts", "2024-01-01", "2024-02-01"
        )
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.count("*").alias("n"))
        .orderBy("d")
    )


@query(
    "f11_correlated_subquery",
    doc="""F11: $expr {$eq:['$userid','$$userid']} correlated
    sub-pipeline (controllers/userController.js:118-125) — users having
    at least one live gemini prompt, as a left-semi join (the join
    condition IS the correlated equality).""",
    fixtures_used=("users", "prompts"),
    oracle="""
SELECT u.user_id AS user_id, u.lname AS lname
FROM users u
WHERE EXISTS (
    SELECT 1 FROM prompts p
    WHERE p.userid = u.user_id
      AND p.bot_provider = 'gemini' AND NOT p.is_deleted
)
ORDER BY u.user_id
""",
)
def f11_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = spark.table("users")
    gemini = (
        spark.table("prompts")
        .filter((F.col("bot_provider") == "gemini") & ~F.col("is_deleted"))
        .select(F.col("userid").alias("user_id"))
    )
    return (
        users.join(gemini, "user_id", "left_semi")
        .select("user_id", "lname")
        .orderBy("user_id")
    )


@query(
    "w3_truncate_after_edit",
    driver=False,
    doc="""W3: edit-truncation — soft-delete every prompt in the thread
    at or after the edited row's timestamp
    (controllers/promptController.js:396-410).""",
    fixtures_used=("prompts",),
    oracle="""
WITH anchor AS (
    SELECT min(created_at) AS edit_ts
    FROM prompts WHERE threadid = 't3-1' AND prompt_id >= 400
)
SELECT p.prompt_id AS prompt_id,
       (p.created_at >= a.edit_ts) AS is_deleted_after
FROM prompts p CROSS JOIN anchor a
WHERE p.threadid = 't3-1'
ORDER BY p.prompt_id
""",
)
def w3_truncate_after_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    prompts = spark.table("prompts").filter(F.col("threadid") == "t3-1")
    anchor = prompts.filter(F.col("prompt_id") >= 400).agg(
        F.min("created_at").alias("edit_ts")
    )
    return (
        prompts.crossJoin(F.broadcast(anchor))
        .select(
            "prompt_id",
            (F.col("created_at") >= F.col("edit_ts")).alias(
                "is_deleted_after"
            ),
        )
        .orderBy("prompt_id")
    )


@query(
    "o3_sort_inside_pipeline",
    driver=False,
    doc="""O3+O4: $sort {'_id.day':1} after the aggregation stage
    (controllers/trackUsageController.js:104-106) and the client-side
    comparator sort of threads by latest createdAt desc
    (promptController.js:376-378) — both one orderBy.""",
    fixtures_used=("prompts",),
    oracle="""
SELECT threadid, max(created_at) AS latest
FROM prompts
WHERE NOT is_deleted AND userid < 40
GROUP BY threadid
ORDER BY latest DESC, threadid
""",
)
def o3_sort_inside_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.table("prompts")
        .filter(~F.col("is_deleted") & (F.col("userid") < 40))
        .groupBy("threadid")
        .agg(F.max("created_at").alias("latest"))
        .orderBy(F.desc("latest"), "threadid")
    )


@query(
    "s1_collection_scan",
    driver=False,
    doc="""S1: Model.find() full collection scan with projection pruning
    (controllers/promptController.js:248 pattern) — the base scan
    operator; .explain shows ReadSchema pruned to three columns.""",
    oracle="""
SELECT count(*) AS n_rows,
       CAST(min(event_id) AS BIGINT) AS min_id,
       CAST(max(event_id) AS BIGINT) AS max_id,
       count(DISTINCT event_type) AS n_types
FROM events
""",
)
def s1_collection_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.table("events").agg(
        F.count("*").alias("n_rows"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.countDistinct("event_type").alias("n_types"),
    )
