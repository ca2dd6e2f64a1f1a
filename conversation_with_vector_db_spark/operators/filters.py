"""Dynamic filter building (SURVEY §2.4).

The reference builds MongoDB filters from query-string JSON, rewriting
``gt|gte|lt|lte|regex`` into ``$gt…`` operators with a regex pass over
the serialized JSON (controllers/organizationController.js:95-128), and
hand-assembles ``$or`` / ``$in`` / ``$exists`` shapes across 25
controllers. Here the same surface is a declarative builder producing a
Catalyst ``Column`` predicate — so pushdown/pruning still apply (the
filter lands in the parquet scan, visible as PushedFilters in
``.explain``).

Spec grammar (a dict, mirroring the reference's query-by-example):
    {"field": value}                       equality          (F1)
    {"field": {"gt"|"gte"|"lt"|"lte": v}}  range             (F12)
    {"field": {"ne": v}}                   negation          (F6)
    {"field": {"in": [v, ...]}}            set membership    (F7)
    {"field": {"regex": pat}}              case-insensitive  (F8)
    {"field": {"exists": bool}}            null-ness         (F5)
    {"or": [spec, spec, ...]}              disjunction       (F9/F10/F13)
    {"and": [spec, spec, ...]}             conjunction       (F2)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
    "ne": lambda c, v: c != v,
    "in": lambda c, v: c.isin(*v),
    # Mongo's {$regex: pat, $options:'i'} — substring-style match,
    # case-insensitive (controllers/userController.js:29-31). The (?i)
    # flag, NOT lower() on both sides: lowercasing the PATTERN inverts
    # uppercase class shorthands (\S becomes \s — the complement) and
    # corrupts any case-sensitive metachar; oracles use the same (?i).
    "regex": lambda c, v: c.rlike("(?i)" + v),
    "exists": lambda c, v: c.isNotNull() if v else c.isNull(),
}


def build_filter(spec: dict) -> Column:
    """Compile a query-by-example spec into one Catalyst predicate."""
    clauses: list[Column] = []
    for key, val in spec.items():
        if key == "or":
            sub = [build_filter(s) for s in val]
            acc = sub[0]
            for s in sub[1:]:
                acc = acc | s
            clauses.append(acc)
        elif key == "and":
            for s in val:
                clauses.append(build_filter(s))
        elif isinstance(val, dict):
            col = F.col(key)
            for op, v in val.items():
                if op not in _OPS:
                    raise ValueError(f"unsupported operator: {op}")
                clauses.append(_OPS[op](col, v))
        else:
            clauses.append(F.col(key) == val)
    if not clauses:
        return F.lit(True)
    acc = clauses[0]
    for c in clauses[1:]:
        acc = acc & c
    return acc


def quantile_threshold(
    scored: "DataFrame",
    score_col: str,
    p: int,
    q: int,
) -> "DataFrame":
    """1-row DataFrame ``(thr)``: the smallest score whose cumulative
    count covers at least p/q of the rows — i.e. the exact lower
    p/q-quantile of ``score_col`` under <=-counting.

    The scalable global-quantile shape: a score histogram (map-side
    combined groupBy whose cardinality is bounded by score
    quantization, not row count), a cumulative-sum window over that
    bounded histogram, and an integer guard ``q*cum >= p*total`` —
    no corpus-wide sort, no float quantile arithmetic, and the 1-row
    result broadcasts into a stateless filter. Callers quantize the
    score (e.g. ``F.round(expr, 4)``) so the histogram stays small.
    """
    from pyspark.sql import Window

    # NULL scores can never satisfy the caller's threshold filter, so
    # counting them in `total` would shift the quantile toward (or
    # onto) the NULL bucket — drop them before the histogram.
    scored = scored.filter(F.col(score_col).isNotNull())
    hist = scored.groupBy(score_col).agg(F.count("*").alias("cnt"))
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy(score_col))
    )
    total = hist.agg(F.sum("cnt").alias("total"))
    return (
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("cum") * q >= F.col("total") * p)
        .agg(F.min(score_col).alias("thr"))
    )


def budget_threshold(
    scored: "DataFrame",
    score_col: str,
    weight_col: str,
    p: int,
    q: int,
) -> "DataFrame":
    """1-row DataFrame ``(thr)``: the largest score such that rows with
    ``score >= thr`` carry at least p/q of the total ``weight_col``
    mass — best-first selection under a weighted budget (tokens,
    bytes), the "pick the highest-quality docs until the token budget
    is met" primitive.

    Same scale shape as :func:`quantile_threshold` — weighted score
    histogram, one cumulative window over the bounded histogram
    DESCENDING, integer guard ``q*cum >= p*total`` — except mass
    accumulates from the TOP. Selection is bucket-granular: the bucket
    that crosses the budget is included whole (deterministic
    overshoot, never undershoot).
    """
    from pyspark.sql import Window

    # NULL-score rows can never pass `score >= thr`; including their
    # mass in `total` would make the crossing bucket the NULL one
    # (thr = NULL -> empty selection) or under-cover the stated
    # budget. Drop them from the histogram.
    scored = scored.filter(F.col(score_col).isNotNull())
    hist = scored.groupBy(score_col).agg(
        F.sum(weight_col).alias("mass")
    )
    cum = hist.withColumn(
        "cum", F.sum("mass").over(Window.orderBy(F.desc(score_col)))
    )
    total = hist.agg(F.sum("mass").alias("total"))
    return (
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("cum") * q >= F.col("total") * p)
        .agg(F.max(score_col).alias("thr"))
    )
