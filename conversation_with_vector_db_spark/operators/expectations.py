"""Declarative data-quality expectations (the Deequ / Great
Expectations working model): a check suite compiles into ONE
aggregation pass over the table and emits a metrics report —
``(check, column, observed, passed)`` — instead of failing fast.

Why one pass matters at 100 TB: each expectation alone is a full
scan; a suite of 10 run naively is 10 scans. Compiling every check
into a single ``df.agg(...)`` makes the whole suite exactly one
map-side-combined scan (plus Spark's Expand for the exact distinct
counts), and the result is a handful of driver rows however large
the table is. Referential integrity is the one check that cannot
fold into the same scan (it needs the parent table); it runs as a
LEFT ANTI join — broadcast when the parent is a dimension, shuffle
otherwise — and unions into the same report.

Check vocabulary (the ``specs`` tuples):

* ``("not_null", col)`` — observed = NULL count, passes at 0.
* ``("unique", col)`` — observed = rows minus distinct values
  (NULLs count as rows but not values, so a nullable unique column
  should also carry not_null), passes at 0.
* ``("values_in", col, values)`` — observed = non-NULL rows outside
  the accepted set (NULL conformance belongs to not_null).
* ``("min_at_least", col, lo)`` / ``("max_at_most", col, hi)`` —
  observed = the actual min/max, passes on the bound (vacuously on
  an all-NULL column, where SQL min/max are NULL).
* ``("row_count_between", lo, hi)`` — observed = count(*).

All observed values surface as DOUBLE so the report is one uniform
relation; `passed` is computed from the same aggregate expressions,
never a second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg_exprs(specs):
    """(aggregate expressions, per-check (name, column, observed_col,
    passed_builder)) for one compiled pass."""
    aggs = []
    meta = []
    for idx, spec in enumerate(specs):
        kind = spec[0]
        slot = f"_m{idx}"
        if kind == "not_null":
            col = spec[1]
            aggs.append(
                F.sum(
                    F.when(F.col(col).isNull(), 1).otherwise(0)
                ).alias(slot)
            )
            meta.append((kind, col, slot, lambda c: c == 0))
        elif kind == "unique":
            col = spec[1]
            aggs.append(
                (F.count("*") - F.count_distinct(F.col(col))).alias(
                    slot
                )
            )
            meta.append((kind, col, slot, lambda c: c == 0))
        elif kind == "values_in":
            col, values = spec[1], spec[2]
            aggs.append(
                F.sum(
                    F.when(
                        F.col(col).isNotNull()
                        & ~F.col(col).isin(list(values)),
                        1,
                    ).otherwise(0)
                ).alias(slot)
            )
            meta.append((kind, col, slot, lambda c: c == 0))
        elif kind == "min_at_least":
            col, lo = spec[1], spec[2]
            aggs.append(F.min(F.col(col)).alias(slot))
            meta.append(
                (
                    kind,
                    col,
                    slot,
                    lambda c, lo=lo: c.isNull() | (c >= F.lit(lo)),
                )
            )
        elif kind == "max_at_most":
            col, hi = spec[1], spec[2]
            aggs.append(F.max(F.col(col)).alias(slot))
            meta.append(
                (
                    kind,
                    col,
                    slot,
                    lambda c, hi=hi: c.isNull() | (c <= F.lit(hi)),
                )
            )
        elif kind == "row_count_between":
            lo, hi = spec[1], spec[2]
            aggs.append(F.count("*").alias(slot))
            meta.append(
                (
                    kind,
                    "*",
                    slot,
                    lambda c, lo=lo, hi=hi: (c >= F.lit(lo))
                    & (c <= F.lit(hi)),
                )
            )
        else:
            raise ValueError(f"unknown expectation kind: {kind!r}")
    return aggs, meta


def expectation_report(df: DataFrame, specs) -> DataFrame:
    """Run the whole suite in one aggregation scan.

    Returns ``(check, column, observed: double, passed: boolean)``,
    one row per spec, in spec order (callers sort for presentation).
    """
    if not specs:
        raise ValueError("expectation_report: empty spec list")
    aggs, meta = _agg_exprs(specs)
    agg = df.agg(*aggs)
    rows = []
    for kind, col, slot, passed in meta:
        c = F.col(slot).cast("double")
        rows.append(
            F.struct(
                F.lit(kind).alias("check"),
                F.lit(col).alias("column"),
                c.alias("observed"),
                F.coalesce(passed(c), F.lit(False)).alias("passed"),
            )
        )
    return agg.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.check", "r.column", "r.observed", "r.passed")


def referential_check(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Orphan count as a one-row report in the same shape:
    ``('ref_integrity', fk, orphans, orphans == 0)``. NULL foreign
    keys are not orphans (optional relationships; pair with not_null
    when the FK is mandatory). LEFT ANTI join — broadcast the parent
    key set when it is dimension-sized, shuffle-hash otherwise."""
    keys = parent.select(F.col(pk).alias(fk)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = (
        child.select(fk)
        .where(F.col(fk).isNotNull())
        .join(keys, fk, "left_anti")
    )
    return orphans.agg(
        F.count("*").cast("double").alias("observed")
    ).select(
        F.lit("ref_integrity").alias("check"),
        F.lit(fk).alias("column"),
        "observed",
        (F.col("observed") == 0).alias("passed"),
    )
