"""Governed UDF surface + SQL entry point (SURVEY §2.14 D1-D8).

The reference persists function definitions in Mongo and compiles them
with ``new Function('axios', 'return async ' + def)``
(utils/assistant.js:336-361) — arbitrary code eval. That is a
vulnerability, not a feature to port: this engine replaces it with a
**whitelisted registry** of named Python callables
(spark.udf.register'd at session setup) and a **validated SQL
passthrough** mirroring the reference's regex-gated Postgres surface
(service/postgreService.js:5-127). Attempts to register or run
anything outside the whitelist raise.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType


@dataclass(frozen=True)
class FunctionDef:
    """D1: a registry row — mirrors models/functionDefinitionModel.js:4-35
    ({name, definition, parameters, description})."""

    name: str
    fn: Callable
    return_type: object
    description: str = ""
    parameters: tuple[str, ...] = field(default_factory=tuple)


def _surrogate_token_count(text: str | None) -> int:
    if not text:
        return 0
    # Explicit ASCII whitespace class, NOT \s: Python's re \s is
    # UNICODE (absorbs NBSP, \x0B, ...) while the d1 oracle's RE2 \s
    # and the declarative t11 form are ASCII — on hostile text the
    # three tokenizers disagreed about what counts as a marker char
    # (r11 cross-engine probe). The spelled-out class is the one
    # definition all three share.
    return len(
        re.findall(r"[a-z0-9]+|[^a-z0-9\t\n\f\r ]", text.lower())
    )


def _title_from_description(text: str | None) -> str:
    # First-50-chars title rule (service/assistantService.js:124).
    return (text or "")[:50]


#: D3: the static name -> implementation map
#: (utils/assistantFunctionMapper.js:4-10).
WHITELIST: dict[str, FunctionDef] = {
    fd.name: fd
    for fd in (
        FunctionDef(
            "surrogate_token_count",
            _surrogate_token_count,
            LongType(),
            "deterministic tiktoken stand-in "
            "(service/trackUsageService.js:46-49)",
            ("text",),
        ),
        FunctionDef(
            "title_from_description",
            _title_from_description,
            StringType(),
            "thread title = first 50 chars "
            "(sockets/assistants/assistantHandler.js:73)",
            ("text",),
        ),
    )
}


def register_udfs(spark: SparkSession) -> list[str]:
    """D1: install every whitelisted function into the session catalog
    so SQL can call them by name."""
    for fd in WHITELIST.values():
        spark.udf.register(fd.name, fd.fn, fd.return_type)
    return sorted(WHITELIST)


class _ChunkUDTF:
    """``chunk_udtf(text, size)`` — the row-set (one-to-many) member
    of the governed function surface, as a Spark 4 Python UDTF: the
    reference's parameterized row-returning functions
    (utils/assistant.js meeting rows; utils/textutils.js splitter)
    are UDTF-shaped, and this is their SQL spelling
    (``FROM docs, LATERAL chunk_udtf(text, 100)``). Arrow-batched
    like every Python boundary here; the DECLARATIVE
    sequence+substring plan (plans/text_pipeline.chunk_fixed) stays
    the scale path — this is the governed escape hatch for logic SQL
    can't express, value-pinned against that plan by the d9 oracle.
    Empty/NULL text yields one empty chunk, matching chunk_fixed's
    greatest(ceil(len/size), 1) contract."""

    def eval(self, text, size: int):
        if size is None or size < 1:
            # Same contract as chunk_fixed: a non-positive size has no
            # chunking meaning — fail with a named error instead of a
            # ZeroDivisionError (or silent nonsense negative slices).
            raise ValueError(
                f"chunk_udtf: size must be >= 1, got {size!r}"
            )
        text = text or ""
        n = max(-(-len(text) // size), 1)
        for i in range(n):
            piece = text[i * size : (i + 1) * size]
            yield i, piece, len(piece)


#: The UDTF whitelist: name -> (class, returnType DDL). Registration
#: is gated exactly like the scalar WHITELIST.
UDTF_WHITELIST: dict[str, tuple[type, str]] = {
    "chunk_udtf": (
        _ChunkUDTF,
        "chunk_id int, chunk string, n_chars int",
    ),
}


def register_udtfs(spark: SparkSession) -> list[str]:
    """Install every whitelisted table function (Python UDTF) into
    the session catalog for SQL LATERAL use."""
    from pyspark.sql.functions import udtf

    for name, (cls, ddl) in UDTF_WHITELIST.items():
        spark.udtf.register(name, udtf(cls, returnType=ddl))
    return sorted(UDTF_WHITELIST)


def compile_definition(name: str, source: str | None = None) -> Callable:
    """D2: the 'compile stored source' gate. The reference eval's the
    stored string; here source is ignored and only whitelisted names
    resolve — everything else raises."""
    if name not in WHITELIST:
        raise PermissionError(
            f"function {name!r} is not in the engine whitelist; "
            "arbitrary definition eval is not supported"
        )
    return WHITELIST[name].fn


# --- D5/D6: validated SQL passthrough -----------------------------------

#: Read-only statements may open with SELECT, a CTE (WITH ... SELECT),
#: or a parenthesized SELECT — all are pure reads.
_SELECT_RE = re.compile(r"^\s*\(*\s*(SELECT|WITH)\b", re.IGNORECASE)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(\w+(?:\.\w+)*)", re.IGNORECASE
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(\w+(?:\.\w+)*)\s+SET\b", re.IGNORECASE
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(\w+(?:\.\w+)*)", re.IGNORECASE
)


def sql_passthrough(spark: SparkSession, sql: str) -> DataFrame:
    """D5: read-only passthrough over the registered views — the
    engine's true SQL entry point (service/postgreService.js:49-63
    validated by regex there). Accepts SELECT, WITH-CTE, and
    parenthesized SELECT forms; everything else is rejected.

    The prefix regex alone is NOT a read-only guarantee: Spark's
    grammar accepts CTE-prefixed DML (``WITH x AS (...) INSERT ...``),
    which starts with WITH and would sail through a prefix check into
    a real write. So after the cheap prefix reject, the statement is
    PARSED (no execution) and the logical plan tree is walked: any
    Command node or Insert* statement node anywhere in the tree —
    root or nested under a CTE — is refused. Fail-closed by
    construction: write nodes always appear as tree nodes; a false
    positive would only reject a read, never admit a write."""
    if not _SELECT_RE.match(sql):
        raise ValueError("only SELECT statements pass through")
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    cmd_cls = spark._jvm.java.lang.Class.forName(
        "org.apache.spark.sql.catalyst.plans.logical.Command"
    )
    stack = [plan]
    while stack:
        node = stack.pop()
        cname = node.getClass().getName().rsplit(".", 1)[-1]
        if cmd_cls.isInstance(node) or cname.startswith("InsertInto"):
            raise ValueError(
                f"only SELECT statements pass through (found {cname})"
            )
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return spark.sql(sql)


def classify_write_statement(sql: str) -> tuple[str, str]:
    """D6: the reference's regex triage of INSERT/UPDATE/DELETE
    (service/postgreService.js:5-46,66-96,99-127). Returns
    (operation, table); the actual mutation is executed as the
    corresponding M-operator (plans/maintenance.py), not raw SQL."""
    for op, rx in (
        ("insert", _INSERT_RE),
        ("update", _UPDATE_RE),
        ("delete", _DELETE_RE),
    ):
        m = rx.match(sql)
        if m:
            # Qualified names (db.tbl) dispatch on the table component;
            # the engine's catalog is single-namespace temp views.
            return op, m.group(1).rsplit(".", 1)[-1]
    raise ValueError("statement is not a recognized INSERT/UPDATE/DELETE")


MAX_QUESTION_CHARS = 32700  # utils/validations.js:4


def validation_gate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """D8: the input-length validation (question <= 32700 chars) as a
    filter predicate."""
    return df.filter(F.length(text_col) <= MAX_QUESTION_CHARS)


def meeting_summary(
    spark: SparkSession,
    start_date: str,
    end_date: str,
    meeting_types: list[str],
) -> DataFrame:
    """D4: the UDTF-shaped meeting_summary(sDate, eDate, type) —
    args -> filtered/joined/projected row set (utils/assistant.js:123-170):
    date-range filter, tag membership, user join, reshaped summary line
    (C2 date format + C8 concat).

    Requires the `prompts`/`users` fixture views to be registered.
    """
    prompts = spark.table("prompts")
    users = spark.table("users")
    return (
        prompts.filter(
            (F.col("promptdate") >= F.lit(start_date).cast("date"))
            & (F.col("promptdate") < F.lit(end_date).cast("date"))
            & ~F.col("is_deleted")
            & F.col("modelused").isin(*meeting_types)
        )
        .join(F.broadcast(users.select("user_id", "lname")),
              F.col("userid") == F.col("user_id"))
        .select(
            "prompt_id",
            F.concat_ws(
                " | ",
                F.date_format("promptdate", "yyyy-MM-dd"),
                F.col("lname"),
                F.col("description"),
            ).alias("summary"),
        )
    )
