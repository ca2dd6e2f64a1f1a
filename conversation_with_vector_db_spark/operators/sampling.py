"""Weighted sampling without replacement via priority sampling
(Duffield, Lund & Thorup 2007): each item draws a uniform hash
``u_i`` and the sample is the ``k`` items with smallest priority
``u_i / w_i`` — heavier items sink toward the front, inclusion
probability grows with weight, and no two passes are needed (the
Efraimidis-Spirakis exponential-key scheme is the same idea with
``u^(1/w)`` keys; priorities keep the arithmetic rational).

Determinism discipline: ``u_i`` is the first 8 hex digits of
``md5(salt:id)`` (a 32-bit integer), and the priority is computed in
INTEGER arithmetic — ``(u << 20) div w`` — so there is no
transcendental (ln, pow) whose last-ulp behavior could differ
between engines: the quantized priority is exactly reproducible in
ANSI SQL (``// `` on BIGINT), ties broken by id. The 2^20 scale
keeps the dividend under 2^52 (exact in BIGINT) while leaving 20
bits of sub-unit resolution per weight step; the quantization only
reorders items whose true priorities agree to ~1e-6 relative, and
the id tiebreak pins those deterministically on both engines.

Scale shape: the priority is a stateless per-row projection; the
global smallest-k lowers to TakeOrderedAndProject (per-partition
top-k, then a k-row merge on the driver) — no global sort, no
shuffle of the corpus. This is the weighted companion to the
hash-bucket splits in plans/scale.py: same append-stability (an
item's priority never changes when other items arrive; only the
cutoff moves), which is what makes the sample maintainable
incrementally at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Sub-unit resolution bits: dividend = u * 2^20 < 2^52, exact BIGINT.
PRIORITY_SHIFT = 1 << 20


def with_priority(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    salt: str = "ws",
) -> DataFrame:
    """Append the integer sampling priority
    ``(md5_32(salt:id) * 2^20) div max(weight, 1)``.

    Weights are clamped to >= 1 (a zero/negative/NULL weight would
    otherwise divide by zero or flip sign); callers that want
    zero-weight items EXCLUDED should filter first.
    """
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ":"), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    w = F.greatest(F.col(weight_col).cast("bigint"), F.lit(1))
    dividend = u * F.lit(PRIORITY_SHIFT)
    # Integer floor division without `div` (keeps the Column API):
    # (a - a % w) is exactly divisible by w and < 2^52, so the double
    # quotient is an exactly-representable integer — no rounding.
    return df.withColumn(
        "priority",
        ((dividend - dividend % w) / w).cast("bigint"),
    )


def weighted_priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "ws",
) -> DataFrame:
    """The k smallest-priority rows (all rows when k >= n), ordered by
    (priority, id). Returns the input columns plus ``priority``."""
    return (
        with_priority(df, weight_col, id_col, salt)
        .orderBy("priority", id_col)
        .limit(k)
    )
