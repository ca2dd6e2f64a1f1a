"""Skew-mitigation operators (100 TB posture).

The fixture data is uniform, but production key distributions aren't
(one hot user, one hot namespace). Two standard mitigations, both pure
DataFrame transforms with results identical to their naive forms:

* :func:`salted_aggregate` — two-stage aggregation: map keys to
  ``(key, salt)`` with ``salt = pmod(hash(cols), n_salts)``, partially
  aggregate, then merge partials per key. The hot key's rows spread
  over ``n_salts`` reducers instead of one. Works for any algebraic
  aggregate (sum/count/min/max).
* :func:`salted_join` — replicate the small side ``n_salts`` times with
  an explicit salt column and salt the big side's key, so a hot join
  key fans across reducers. (AQE's skew-join split —
  ``spark.sql.adaptive.skewJoin`` — already handles sort-merge cases
  at runtime; explicit salting is for the planned-ahead pipelines and
  for aggregations, which AQE does not split.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe groupBy.

    ``aggs`` maps output column name -> "sum:col" | "count:*" |
    "min:col" | "max:col". The result equals the single-stage
    ``df.groupBy(keys).agg(...)`` exactly (algebraic merge), so the
    operator is oracle-checkable.
    """
    # Per-ROW salt (not per-key): hashing only the group keys would
    # keep each hot key on a single reducer — the thing being avoided.
    # The salt value doesn't affect results, only placement.
    salt = F.pmod(
        F.hash(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    )

    partial_aggs, merge_aggs = [], []
    for out, spec in aggs.items():
        op, _, col = spec.partition(":")
        p = f"__p_{out}"
        if op == "count":
            # count:* = row count; count:col = non-null count (the
            # SQL count(col) semantics) — silently counting rows for a
            # named column would diverge from the stated single-stage
            # equivalence whenever the column has NULLs.
            partial_aggs.append(F.count(col).alias(p))
            merge_aggs.append(F.sum(p).alias(out))
        elif op == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            merge_aggs.append(F.sum(p).alias(out))
        elif op == "min":
            partial_aggs.append(F.min(col).alias(p))
            merge_aggs.append(F.min(p).alias(out))
        elif op == "max":
            partial_aggs.append(F.max(col).alias(p))
            merge_aggs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"unsupported agg spec: {spec}")

    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: small side replicated n_salts times, big
    side salted per row — a hot key's probe rows spread across
    n_salts reducers. Result equals ``big.join(small, key)``."""
    salted_small = small.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt"),
    )
    salted_big = big.withColumn(
        "__salt",
        F.pmod(
            F.hash(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(n_salts),
        ),
    )
    return salted_big.join(salted_small, [key, "__salt"]).drop("__salt")
