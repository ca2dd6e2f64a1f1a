"""Temporal joins: the distributed as-of join.

Spark has no ASOF JOIN operator (DuckDB/Pandas/kdb do). The naive
rewrites are wrong at scale: an inequality theta-join explodes to the
full per-key cross product before picking the max, and a
per-left-row correlated subquery doesn't distribute at all. The
scale-correct shape is UNION-AND-WINDOW: tag both sides, union them,
sort each key's timeline once (ONE shuffle, on the join key), and let
``last(payload, ignorenulls=True)`` over the running frame carry the
most recent right row forward to every left row. Cost is the cost of
one sort-shuffle of left+right — no pair explosion, no re-shuffle per
side — and skew follows the key distribution exactly like any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TB = "_asof_tb"
_PAYLOAD = "_asof"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] | None = None,
    tiebreak: str | None = None,
    strict: bool = False,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """For every left row, attach the LATEST right row of the same
    ``on`` key with ``right.ts <= left.ts`` (``strict=True``: ``<``)
    as a nullable struct column ``_asof`` holding ``right_cols``
    (default: ``ts`` plus ``tiebreak``). No match -> NULL struct.

    Determinism under equal right timestamps is explicit, not
    accidental: among same-(key, ts) right rows the one with the
    greatest ``tiebreak`` wins (pass the right side's id column; with
    no ties the argument is irrelevant). ``tolerance_sec`` voids
    matches older than the window — the pandas ``merge_asof``
    tolerance semantics.

    Plan shape: unionByName (missing columns null-filled) -> ONE
    window over (key, time, side, tiebreak) -> filter back to left
    rows. The side bit orders right rows BEFORE left at equal ts for
    the inclusive form and AFTER for the strict form, so the running
    frame itself encodes the boundary rule.
    """
    if right_cols is None:
        right_cols = (ts,) if tiebreak is None else (ts, tiebreak)
    if ts not in right_cols:
        right_cols = (ts, *right_cols)  # tolerance/gap need the ts
    tb_col = (
        F.col(tiebreak) if tiebreak is not None else F.lit(0)
    )
    right_u = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0 if not strict else 2).alias(_SIDE),
        tb_col.cast("long").alias(_TB),
        F.struct(*[F.col(c) for c in right_cols]).alias(_PAYLOAD),
    )
    left_u = left.select(
        "*",
        F.lit(1).alias(_SIDE),
        F.lit(0).cast("long").alias(_TB),
        F.lit(None).cast(
            right_u.schema[_PAYLOAD].dataType
        ).alias(_PAYLOAD),
    )
    unioned = left_u.unionByName(right_u, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc(), F.col(_TB).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn(
            _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
        )
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE, _TB)
    )
    if tolerance_sec is not None:
        horizon = (
            F.col(ts).cast("double")
            - F.col(f"{_PAYLOAD}.{ts}").cast("double")
        ) <= float(tolerance_sec)
        matched = matched.withColumn(
            _PAYLOAD, F.when(horizon, F.col(_PAYLOAD))
        )
    return matched


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    bucket_width_us: int = 1_800_000_000,
) -> DataFrame:
    """Range (interval) join without the theta-join trap: every
    ``points`` row paired with every SAME-KEY ``intervals`` row whose
    ``[lo, hi)`` contains its timestamp.

    Spark plans a raw ``p.ts >= i.lo AND p.ts < i.hi`` join as a
    per-key cross product (or worse, BroadcastNestedLoop when the
    equi-key is missing) — quadratic in the key's row count. The
    scale-correct rewrite is BUCKETIZATION (the published range-join
    optimization Databricks exposes as a hint, built here from
    primitives): quantize time into fixed ``bucket_width_us`` cells,
    explode each interval to the cells it overlaps
    (``sequence(floor(lo), floor(hi))`` — intervals no wider than a
    few buckets explode to a few rows), equi-join points on
    ``(key, cell)``, then verify the exact containment predicate.
    Cost: one hash shuffle on (key, cell) of points + exploded
    intervals; the verify filter runs inside the join stage. Pick
    ``bucket_width_us`` near the typical interval width — each
    interval then lands in ~2 cells and each point in exactly one.

    Output: all ``points`` columns plus the interval's columns
    (callers project). Timestamps compare as ``unix_micros`` longs —
    exact integer arithmetic, no timezone re-interpretation.
    """
    w = F.lit(bucket_width_us).cast("long")
    p_us = F.unix_micros(F.col(ts).cast("timestamp"))
    lo_us = F.unix_micros(F.col(lo).cast("timestamp"))
    hi_us = F.unix_micros(F.col(hi).cast("timestamp"))

    pts = points.withColumn("_t_us", p_us).withColumn(
        "_cell", F.floor(F.col("_t_us") / w)
    )
    ivs = (
        intervals.withColumn("_lo_us", lo_us)
        .withColumn("_hi_us", hi_us)
        .withColumn(
            "_cell",
            F.explode(
                F.sequence(
                    F.floor(F.col("_lo_us") / w),
                    # hi is EXCLUSIVE: an interval ending exactly on a
                    # cell boundary does not reach into the next cell.
                    F.floor((F.col("_hi_us") - 1) / w),
                )
            ),
        )
    )
    return (
        pts.join(ivs, [on, "_cell"])
        .filter(
            (F.col("_t_us") >= F.col("_lo_us"))
            & (F.col("_t_us") < F.col("_hi_us"))
        )
        .drop("_cell", "_t_us", "_lo_us", "_hi_us")
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_us: str = "us",
    tiebreak: str = "event_id",
    gap_us: int = 900 * 1_000_000,
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): assign each event a
    per-``key`` session ordinal that increments wherever the idle gap
    to the previous event exceeds ``gap_us`` (an event exactly
    ``gap_us`` after its predecessor stays in the session — the
    boundary matches a TTL that is refreshed on activity).

    ONE hash shuffle on ``key`` serves both ordered passes (the lag
    flag and the running session sum share the frame). ROWS framing
    is order-sensitive among timestamp ties, so both passes order by
    ``(ts_us, tiebreak)`` — tie rows never split sessions
    differently across retries or engines.

    Returns the input columns plus ``session_id`` (1-based bigint).
    """
    w = Window.partitionBy(key).orderBy(ts_us, tiebreak)
    prev = F.lag(ts_us).over(w)
    flagged = events.withColumn(
        "_new_sess",
        (prev.isNull() | (F.col(ts_us) - prev > F.lit(gap_us)))
        .cast("long"),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        "session_id", F.sum("_new_sess").over(run)
    ).drop("_new_sess")
