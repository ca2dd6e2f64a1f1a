"""Join queries (SURVEY §2.6).

The reference joins two ways: server-side ``$lookup`` (left-outer hash
inside mongod) and app-side N+1 loops (per-row findOne/countDocuments).
Both become declarative Spark joins; every N+1 loop is rewritten as ONE
join against a pre-aggregated side — the semantics-preserving fix the
reference couldn't express (documented in SURVEY §4).

Scale notes: dims (users, assistants, nation) are broadcast — no
shuffle of the fact side; pre-aggregation (groupBy before join) keeps
shuffle rows at one-per-key; semi/anti joins never materialize payload
columns from the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query


@query(
    "j2_assistants_users_lookup",
    driver=False,
    doc="""J2: assistants $lookup users + $unwind => inner broadcast
    hash join (controllers/assistantController.js:447-457).""",
    fixtures_used=("assistants", "users"),
    oracle="""
SELECT a.assistant_id AS assistant_id, a.name AS name,
       u.lname AS owner_name, u.role AS owner_role
FROM assistants a
JOIN users u ON a.user_id = u.user_id
WHERE NOT a.is_deleted
ORDER BY a.assistant_id
""",
)
def j2_assistants_users_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    assistants = spark.table("assistants").filter(~F.col("is_deleted"))
    users = spark.table("users")
    return (
        assistants.join(F.broadcast(users), "user_id", "inner")
        .select(
            "assistant_id",
            "name",
            F.col("lname").alias("owner_name"),
            F.col("role").alias("owner_role"),
        )
        .orderBy("assistant_id")
    )


@query(
    "j3_users_prompts_nested",
    doc="""J3: correlated $lookup pipeline keeping the joined rows as a
    nested array ($expr $eq userid, userController.js:115-127) => left
    join + collect_list; the nested list is rendered as a sorted joined
    string so the DuckDB oracle can hash it.""",
    fixtures_used=("users", "prompts"),
    oracle="""
SELECT u.user_id AS user_id,
       count(p.prompt_id) AS prompts_count,
       coalesce(array_to_string(
           list_sort(list(p.prompt_id::VARCHAR)), ','), '')
           AS prompt_ids
FROM users u
LEFT JOIN prompts p ON p.userid = u.user_id AND NOT p.is_deleted
WHERE u.user_id < 15
GROUP BY u.user_id
ORDER BY u.user_id
""",
)
def j3_users_prompts_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = spark.table("users").filter(F.col("user_id") < 15)
    prompts = spark.table("prompts").filter(~F.col("is_deleted"))
    return (
        users.join(prompts, prompts.userid == users.user_id, "left")
        .groupBy("user_id")
        .agg(
            F.count("prompt_id").alias("prompts_count"),
            F.coalesce(
                F.array_join(
                    F.array_sort(
                        F.collect_list(F.col("prompt_id").cast("string"))
                    ),
                    ",",
                ),
                F.lit(""),
            ).alias("prompt_ids"),
        )
        .orderBy("user_id")
    )


@query(
    "j5_thread_first_assistant",
    driver=False,
    doc="""J5: threads $lookup assistants + $arrayElemAt 0
    (service/assistantService.js:131-148) — left join on the unique
    assistant key, min() as the deterministic 'first'.""",
    fixtures_used=("prompts", "assistants"),
    oracle="""
WITH threads AS (
    SELECT DISTINCT threadid,
           'asst_' || CAST(userid % 200 AS STRING) AS assistant_id
    FROM prompts
)
SELECT t.threadid AS threadid,
       t.assistant_id AS assistant_id,
       min(a.name) AS assistant_name
FROM threads t
LEFT JOIN assistants a ON a.assistant_id = t.assistant_id
GROUP BY t.threadid, t.assistant_id
ORDER BY t.threadid
""",
)
def j5_thread_first_assistant(spark: SparkSession, sf_dir: str) -> DataFrame:
    threads = (
        spark.table("prompts")
        .select(
            "threadid",
            F.concat(
                F.lit("asst_"), (F.col("userid") % 200).cast("string")
            ).alias("assistant_id"),
        )
        .distinct()
    )
    assistants = spark.table("assistants")
    return (
        threads.join(F.broadcast(assistants), "assistant_id", "left")
        .groupBy("threadid", "assistant_id")
        .agg(F.min("name").alias("assistant_name"))
        .orderBy("threadid")
    )


@query(
    "j7_fav_counts_join",
    driver=False,
    doc="""J7+A13: public assistants x favourite counts — the reference
    issues countDocuments per row in a loop
    (controllers/publicAssistantController.js:57-75); rewritten as one
    left join against groupBy(assistant_id).count().""",
    fixtures_used=("assistants", "favorites"),
    oracle="""
WITH counts AS (
    SELECT assistant_id, count(*) AS fav_count
    FROM favorites GROUP BY assistant_id
)
SELECT a.assistant_id AS assistant_id, a.name AS name,
       CAST(coalesce(c.fav_count, 0) AS BIGINT) AS fav_count
FROM assistants a
LEFT JOIN counts c ON c.assistant_id = a.assistant_id
WHERE a.is_active AND NOT a.is_deleted
ORDER BY fav_count DESC, a.assistant_id
""",
)
def j7_fav_counts_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    assistants = spark.table("assistants").filter(
        F.col("is_active") & ~F.col("is_deleted")
    )
    counts = (
        spark.table("favorites")
        .groupBy("assistant_id")
        .agg(F.count("*").alias("fav_count"))
    )
    return (
        assistants.join(counts, "assistant_id", "left")
        .select(
            "assistant_id",
            "name",
            F.coalesce("fav_count", F.lit(0)).alias("fav_count"),
        )
        .orderBy(F.desc("fav_count"), "assistant_id")
    )


@query(
    "j8_favorites_details",
    driver=False,
    doc="""J8: favourites -> assistant details, findOne per row in the
    reference (controllers/favoriteAssistantController.js:108-138) =>
    single left join.""",
    fixtures_used=("favorites", "assistants"),
    oracle="""
SELECT f.fav_id AS fav_id, f.user_id AS user_id,
       f.assistant_id AS assistant_id, a.name AS name,
       a.category AS category
FROM favorites f
LEFT JOIN assistants a ON a.assistant_id = f.assistant_id
WHERE f.user_id < 20
ORDER BY f.fav_id
""",
)
def j8_favorites_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    favorites = spark.table("favorites").filter(F.col("user_id") < 20)
    assistants = spark.table("assistants").select(
        "assistant_id", "name", "category"
    )
    return (
        favorites.join(F.broadcast(assistants), "assistant_id", "left")
        .select("fav_id", "user_id", "assistant_id", "name", "category")
        .orderBy("fav_id")
    )


@query(
    "j9_company_daily_rollup",
    doc="""J9: companies -> users -> prompt counts, a double N+1 loop in
    the reference (service/aggregationService.js:36-60, dead code) =>
    two joins + one groupBy. nation stands in for companies.""",
    fixtures_used=("users", "prompts"),
    oracle="""
SELECT n.n_name AS company,
       count(p.prompt_id) AS prompt_count,
       CAST(sum(coalesce(p.tokenused, 0)) AS BIGINT) AS tokens
FROM nation n
JOIN users u ON u.company_id = n.n_nationkey
JOIN prompts p ON p.userid = u.user_id
WHERE NOT p.is_deleted
GROUP BY n.n_name
ORDER BY prompt_count DESC, company
""",
)
def j9_company_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = spark.table("nation")
    users = spark.table("users")
    prompts = spark.table("prompts").filter(~F.col("is_deleted"))
    per_user = prompts.groupBy("userid").agg(
        F.count("*").alias("prompt_count"),
        F.sum(F.coalesce("tokenused", F.lit(0))).alias("tokens"),
    )
    return (
        per_user.join(
            F.broadcast(users.select("user_id", "company_id")),
            per_user.userid == F.col("user_id"),
        )
        .join(
            F.broadcast(nation),
            F.col("company_id") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("company"))
        .agg(
            F.sum("prompt_count").alias("prompt_count"),
            F.sum("tokens").alias("tokens"),
        )
        # Presentation sort dropped (r11): the gate hashes
        # order-insensitively and the ORDER BY cost a range exchange.
    )


@query(
    "j10_company_semi_join",
    driver=False,  # local parity since the r8 third-session rotation
    doc="""J10: users-of-company then prompts {userid: {$in: userIds}}
    (service/aggregationService.js:14-16,28-30) => left-semi join; the
    probe side's payload never shuffles.""",
    fixtures_used=("users", "prompts"),
    oracle="""
SELECT count(*) AS n_prompts,
       count(DISTINCT userid) AS n_users
FROM prompts
WHERE userid IN (SELECT user_id FROM users WHERE company_id = 5)
""",
)
def j10_company_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    members = (
        spark.table("users")
        .filter(F.col("company_id") == 5)
        .select(F.col("user_id").alias("userid"))
    )
    return (
        spark.table("prompts")
        .join(F.broadcast(members), "userid", "left_semi")
        .agg(
            F.count("*").alias("n_prompts"),
            F.countDistinct("userid").alias("n_users"),
        )
    )


@query(
    "j13_company_status_check",
    driver=False,
    doc="""J13: login-time company status lookup
    (controllers/auth.js:107-110) — status derived from the company key
    identically on both sides.""",
    fixtures_used=("users",),
    oracle="""
SELECT u.user_id AS user_id,
       n.n_name AS company,
       CASE WHEN n.n_nationkey % 7 = 0 THEN 'inactive'
            ELSE 'active' END AS company_status
FROM users u
JOIN nation n ON n.n_nationkey = u.company_id
WHERE u.user_id < 25
ORDER BY u.user_id
""",
)
def j13_company_status_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = spark.table("users").filter(F.col("user_id") < 25)
    nation = spark.table("nation")
    return (
        users.join(
            F.broadcast(nation), users.company_id == nation.n_nationkey
        )
        .select(
            "user_id",
            F.col("n_name").alias("company"),
            F.when(F.col("n_nationkey") % 7 == 0, "inactive")
            .otherwise("active")
            .alias("company_status"),
        )
        .orderBy("user_id")
    )


@query(
    "j14_teams_membership_any",
    # Local tier since the late-r8 rotation (s15/a20 in): the J family
    # keeps driver rows via the flagship, j3, j9 and j10.
    driver=False,
    doc="""J14+A10: teams-array membership expansion + any(hasAccess)
    (controllers/auth.js:113-125) — explode(teams) x join teams-side
    flag, then max(bool) per user. Teams arrays are built identically
    on both sides from scalar keys.""",
    fixtures_used=("users", "assistants"),
    oracle="""
WITH membership AS (
    SELECT user_id, unnest([user_id % 25, (user_id + 7) % 25]) AS team_id
    FROM users WHERE user_id < 60
)
SELECT m.user_id AS user_id,
       coalesce(bool_or(a.function_calling), false) AS has_access
FROM membership m
LEFT JOIN assistants a ON a.team_id = m.team_id AND NOT a.is_deleted
GROUP BY m.user_id
ORDER BY m.user_id
""",
)
def j14_teams_membership_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = spark.table("users").filter(F.col("user_id") < 60)
    membership = users.select(
        "user_id",
        F.explode(
            F.array(F.col("user_id") % 25, (F.col("user_id") + 7) % 25)
        ).alias("team_id"),
    )
    assistants = spark.table("assistants").filter(~F.col("is_deleted"))
    return (
        membership.join(
            F.broadcast(assistants.select("team_id", "function_calling")),
            "team_id",
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.coalesce(F.max("function_calling"), F.lit(False)).alias(
                "has_access"
            )
        )
        .orderBy("user_id")
    )


@query(
    "j15_asof_attribution",
    driver=False,
    doc="""AS-OF JOIN (engine extra — the classic temporal operator
    Spark lacks): every purchase event attributed to the SAME user's
    latest click at-or-before it. Implemented as the distributed
    union-and-window as-of (operators/temporal.asof_join): one
    sort-shuffle of both event streams on user_id, last(payload)
    IGNORE NULLS over the running per-user timeline — no inequality
    theta-join pair explosion, no correlated per-row probe. The
    DuckDB oracle is the NATIVE ASOF LEFT JOIN, so the two engines
    cross-check genuinely independent implementations of the
    semantics. gap_us is integer microseconds (exact on both
    engines).""",
    oracle="""
SELECT p.event_id AS event_id, p.user_id AS user_id,
       c.event_id AS click_event_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY event_id
""",
)
def j15_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_join

    ev = spark.table("events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        ts="ts",
        right_cols=("ts", "event_id"),
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("_asof.event_id").alias("click_event_id"),
        (
            # unix_micros needs TIMESTAMP; the NTZ fixture cast is
            # exact under the engine's pinned UTC session timezone.
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("_asof.ts").cast("timestamp"))
        ).alias("gap_us"),
    ).orderBy("event_id")


@query(
    "j16_interval_attribution",
    driver=False,
    doc="""RANGE (interval) JOIN (engine extra, the second classic
    temporal operator Spark lacks): every event attributed to each
    SAME-user incident window ([error ts, +30 min)) containing it,
    rolled up per incident. Implemented as the bucketized range join
    (operators/temporal.interval_bucket_join): quantize time to
    30-min cells, explode each interval to its 1-2 cells, equi-join
    on (user, cell), verify exact containment — one hash shuffle,
    never the per-key cross product Spark plans for a raw inequality
    join. A point lands in exactly one cell, so no pair dedupe is
    needed. The oracle runs the naive BETWEEN theta-join: two
    independent formulations cross-check.""",
    oracle="""
WITH inc AS (
    SELECT event_id AS incident_id, user_id, ts AS lo,
           ts + INTERVAL 30 MINUTE AS hi
    FROM events WHERE event_type = 'error'
)
SELECT i.incident_id, i.user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types,
       round(sum(e.value), 4) AS total_value
FROM inc i JOIN events e
  ON e.user_id = i.user_id AND e.ts >= i.lo AND e.ts < i.hi
GROUP BY i.incident_id, i.user_id
ORDER BY incident_id
""",
)
def j16_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import interval_bucket_join

    ev = spark.table("events")
    incidents = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("hi"),
    )
    joined = interval_bucket_join(
        ev.select("user_id", "ts", "event_type", "value"),
        incidents,
        on="user_id",
    )
    return (
        joined.groupBy("incident_id", "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("event_type").cast("long").alias("n_types"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("incident_id")
    )
