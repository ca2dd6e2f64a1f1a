"""Reference-shaped derived tables (FIXTURES.md group B).

The reference's operational collections (``users``, ``prompts``,
``usage``, ``token_prices``, ``config``, ``assistants``) don't exist as
driver parquet; they are derived *deterministically* from the base
tables. Each derivation is written ONCE as engine-portable ANSI SQL and
executed by BOTH Spark (``register_derived_views``) and the DuckDB
oracle (queries inline them as CTEs via :func:`with_fixtures`), so the
two sides agree by construction.

Portability rules for these strings: no arrays/maps, no hash functions,
no dialect-specific date functions — arithmetic, CASE, ``%``, string
concatenation via ``||``, and standard aggregates only. Two traps
verified empirically: ``CAST(double AS BIGINT)`` truncates in Spark but
rounds in DuckDB (always go through ``floor()``), and bare decimal
literals are DECIMAL in Spark's VALUES (cast prices to DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# users — stands in for models/user.js:12-91 (role enum at 61-65,
# default max_user_tokens 5000 at 14-17). 1-in-50 admin, user 0 is
# superadmin; ~2% soft-deleted via tombstone email (userController.js:515-545).
USERS_SQL = """
SELECT
    c_custkey                                   AS user_id,
    'User'                                      AS fname,
    c_name                                      AS lname,
    lower(c_name) || '@example.com'             AS email,
    CASE WHEN c_custkey = 0 THEN 'superadmin'
         WHEN c_custkey % 50 = 0 THEN 'admin'
         ELSE 'user' END                        AS role,
    CASE WHEN c_custkey % 10 = 9 THEN 'inactive'
         ELSE 'active' END                      AS status,
    c_nationkey                                 AS company_id,
    5000 - (c_custkey % 7) * 700                AS max_user_tokens,
    CASE WHEN c_custkey % 47 = 3
         THEN '2024-01-15T00:00:00Z' END        AS deleted_email
FROM customer
"""

# prompts — stands in for models/promptModel.js:4-58. Derived from
# events: thread id buckets users' events, tokenused NULL ~1-in-19 rows
# (exercises $exists, promptController.js:556), modelused NULL ~1-in-11
# (F10 disjunction), is_deleted 1-in-20 (soft delete M1).
PROMPTS_SQL = """
SELECT
    event_id                                    AS prompt_id,
    't' || CAST(user_id % 500 AS STRING) || '-'
        || CAST(event_id % 7 AS STRING)        AS threadid,
    user_id                                     AS userid,
    'prompt about ' || event_type               AS description,
    'response for event ' ||
        CAST(event_id AS STRING)               AS promptresponse,
    CASE WHEN event_id % 19 = 7 THEN NULL
         ELSE CAST(floor(value * 100) AS BIGINT) END   AS tokenused,
    CAST(ts AS DATE)                            AS promptdate,
    CASE WHEN event_id % 11 = 5 THEN NULL
         WHEN event_id % 3 = 0 THEN 'gpt-4'
         WHEN event_id % 3 = 1 THEN 'gpt-3.5-turbo'
         ELSE 'gemini-pro' END                  AS modelused,
    CASE WHEN event_id % 3 = 2 THEN 'gemini'
         ELSE 'openai' END                      AS bot_provider,
    event_id % 20 = 0                           AS is_deleted,
    ts                                          AS created_at
FROM events
"""

# token_prices — literal rows mirroring constants/tokenPrices.js:1-30
# (prices per 1K tokens) plus the 0.01/0.01 fallback used at
# service/trackUsageService.js:38,89.
TOKEN_PRICES_SQL = """
SELECT model, provider,
       CAST(input_d AS DOUBLE)  AS input,
       CAST(output_d AS DOUBLE) AS output
FROM (
    VALUES
        ('gpt-4',              'openai', 0.03,    0.06),
        ('gpt-4-32k',          'openai', 0.06,    0.12),
        ('gpt-4-turbo',        'openai', 0.01,    0.03),
        ('gpt-4o',             'openai', 0.005,   0.015),
        ('gpt-3.5-turbo',      'openai', 0.0015,  0.002),
        ('gpt-3.5-turbo-16k',  'openai', 0.003,   0.004),
        ('text-embedding-ada-002', 'openai', 0.0001, 0.0001),
        ('dall-e-3',           'openai', 0.04,    0.04),
        ('gemini-pro',         'gemini', 0.000125, 0.000375),
        ('gemini-pro-vision',  'gemini', 0.000125, 0.000375),
        ('claude-2',           'claude', 0.008,   0.024),
        ('claude-instant',     'claude', 0.0008,  0.0024),
        ('claude-3-opus',      'claude', 0.015,   0.075),
        ('claude-3-sonnet',    'claude', 0.003,   0.015),
        ('claude-3-haiku',     'claude', 0.00025, 0.00125)
) AS raw(model, provider, input_d, output_d)
"""

# usage — stands in for models/trackUsageModel.js:3-44 (token counts
# normalized to BIGINT; the reference declares String but writes
# numbers). Cost uses the provider formula of
# service/trackUsageService.js:61-74: openai divides by 1000, gemini
# does not, claude costs 0.
USAGE_SQL = """
SELECT
    e.event_id                                  AS usage_id,
    e.user_id                                   AS user_id,
    CAST(floor(e.value * 10) AS BIGINT)                AS input_token,
    CAST(floor(e.value * 25) AS BIGINT)                AS output_token,
    p.model                                     AS model_used,
    p.input                                     AS input_token_price,
    p.output                                    AS output_token_price,
    CAST(floor(e.value * 10) AS BIGINT)
        + CAST(floor(e.value * 25) AS BIGINT)          AS total_tokens,
    CASE p.provider
        WHEN 'openai' THEN
            (CAST(floor(e.value * 10) AS BIGINT) * p.input
             + CAST(floor(e.value * 25) AS BIGINT) * p.output) / 1000
        WHEN 'gemini' THEN
            CAST(floor(e.value * 10) AS BIGINT) * p.input
            + CAST(floor(e.value * 25) AS BIGINT) * p.output
        ELSE 0.0 END                            AS total_token_cost,
    e.ts                                        AS created_at
FROM events e
JOIN ({token_prices}) p
  ON p.model = CASE e.event_id % 5
                   WHEN 0 THEN 'gpt-4'
                   WHEN 1 THEN 'gpt-3.5-turbo'
                   WHEN 2 THEN 'gemini-pro'
                   WHEN 3 THEN 'claude-3-sonnet'
                   ELSE 'gpt-4o' END
""".format(token_prices=TOKEN_PRICES_SQL)

# config — 8 literal rows from migrations/initial-config.js:2-35.
CONFIG_SQL = """
SELECT * FROM (
    VALUES
        ('temperature',       '0.7'),
        ('tokens',            '3000'),
        ('openaikey',         'sk-test-fixture'),
        ('model',             'gpt-4'),
        ('top_p',             '0.1'),
        ('frequency_penalty', '0.8'),
        ('presence_penalty',  '0.9'),
        ('threshold',         '0.8')
) AS t(key, value)
"""

# assistants — small dim mirroring models/assistantModel.js:3-111
# (category enum at 63-67, is_active/is_deleted flags, pin flag for the
# two-key sort O2). 200 deterministic rows derived from part.
ASSISTANTS_SQL = """
SELECT
    'asst_' || CAST(p_partkey AS STRING)       AS assistant_id,
    p_name                                      AS name,
    CASE WHEN p_partkey % 4 = 0 THEN 'ORGANIZATIONAL'
         ELSE 'PERSONAL' END                    AS category,
    p_partkey % 150                             AS user_id,
    p_partkey % 25                              AS team_id,
    p_partkey % 3 <> 0                          AS is_active,
    p_partkey % 17 = 0                          AS is_deleted,
    p_partkey % 9 = 0                           AS is_pinned,
    p_partkey % 5 = 0                           AS function_calling
FROM part
WHERE p_partkey < 200
"""

# favorites — stands in for models/favoriteAssistantModel (counted per
# assistant at service/favoriteAssistantService.js:33-35; N+1 loop at
# controllers/publicAssistantController.js:57-75). Derived from click
# events so counts are skewed like real favourite data.
FAVORITES_SQL = """
SELECT
    event_id                                    AS fav_id,
    user_id                                     AS user_id,
    'asst_' || CAST(event_id % 200 AS STRING)   AS assistant_id,
    ts                                          AS created_at
FROM events
WHERE event_type = 'click'
"""

# conversations — message-per-row mirror of the Redis session state and
# conversation.messages[] nested array
# (models/userConversationModels.js:4-14; session JSON at
# controllers/conversationController.js:14,54-57). Sender alternates
# user/bot; conversation id buckets a user's events.
CONVERSATIONS_SQL = """
SELECT
    'c' || CAST(user_id AS STRING) || '-'
        || CAST(event_id % 3 AS STRING)         AS conversation_id,
    ts                                          AS ts,
    CASE WHEN event_id % 2 = 0 THEN 'user'
         ELSE 'bot' END                         AS sender,
    'message ' || CAST(event_id AS STRING)
        || ' about ' || event_type              AS message
FROM events
"""

# corpus — documents plus planted duplicates so the dedup family has
# known positives: every 10th doc gets an exact copy (+500000000), every
# 7th a near-copy with an appended tail (+1000000000), every 13th a
# near-copy with a changed head (+1500000000).
#
# CONTRACT: base doc_id must stay < 500000000 or plant ids alias real
# documents and the "known positives" become ambiguous — both engines
# agree, so parity can't catch it. Offsets were raised from 1e5/2e5/3e5
# in r5 so sf10's 500k docs (and anything up to ~sf10,000) generate
# alias-free; the CEILING is the packed-pair arithmetic, which needs
# ids < 2^31 (operators/dedup.py pair_counts_from_lists).
# tools/gen_sf.py enforces this at generation time; the plans'
# `doc_id < 500000000` plant/base discriminators assume it.
CORPUS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 500000000 AS doc_id, text
FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT doc_id + 1000000000 AS doc_id,
       text || ' appended tail marker words' AS text
FROM documents WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id + 1500000000 AS doc_id,
       'changed head marker ' || text AS text
FROM documents WHERE doc_id % 13 = 0
"""

#: name -> portable derivation SQL (CTE-ready, no trailing semicolons).
DERIVED_VIEWS: dict[str, str] = {
    "token_prices": TOKEN_PRICES_SQL,
    "users": USERS_SQL,
    "prompts": PROMPTS_SQL,
    "usage": USAGE_SQL,
    "config": CONFIG_SQL,
    "assistants": ASSISTANTS_SQL,
    "favorites": FAVORITES_SQL,
    "conversations": CONVERSATIONS_SQL,
    "corpus": CORPUS_SQL,
}


def register_derived_views(spark: SparkSession) -> None:
    """Register the reference-shaped views on top of the base temp views
    (call after :func:`..session.load_tables`). Idempotent per session +
    sf_dir (tracks the loader's marker) — re-parsing 9 view definitions
    per query call is measurable overhead."""
    marker = "spark.cvdb.derived.sfdir"
    current = spark.conf.get("spark.cvdb.registered.sfdir", None)
    if current is not None and spark.conf.get(marker, None) == current:
        return
    for name, sql in DERIVED_VIEWS.items():
        spark.sql(sql).createOrReplaceTempView(name)
    if current is not None:
        spark.conf.set(marker, current)


def with_fixtures(sql: str, *names: str) -> str:
    """Wrap an oracle SQL string in CTEs for the named derived tables so
    DuckDB (which only has the ten base views) can run it."""
    if not names:
        return sql
    ctes = ", ".join(f"{n} AS ({DERIVED_VIEWS[n]})" for n in names)
    stripped = sql.lstrip()
    upper = stripped.upper()
    if upper.startswith("WITH RECURSIVE"):
        # The prefix merge would yield "WITH <ctes>, RECURSIVE x AS
        # (...)" — a parse error (or worse, a silently non-recursive
        # CTE). Until now this constraint lived only in comments; make
        # it self-enforcing: recursive oracles must inline their
        # fixtures by hand (see plans/dedup.py's closure CTEs).
        raise ValueError(
            "WITH RECURSIVE oracles cannot declare fixtures_used — "
            "inline the fixture CTEs after the RECURSIVE keyword"
        )
    if upper.startswith("WITH") and (
        len(stripped) == 4
        or not (stripped[4].isalnum() or stripped[4] == "_")
    ):
        # Merge with the query's own CTE list: WITH a AS (...), <rest>.
        # The boundary check keeps a WITH-prefixed identifier (e.g.
        # "WITHDRAWALS.x") from being mangled.
        return f"WITH {ctes}, {stripped[4:].lstrip()}"
    return f"WITH {ctes} {sql}"
