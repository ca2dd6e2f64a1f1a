"""Z-order (Morton) data layout: multi-column file skipping.

A table laid out by ONE sort key prunes file-level min/max stats for
predicates on that key only; a 100 TB table queried by two
dimensions (time x tenant, orderkey x partkey, ...) wants both
dimensions to cluster. Z-ordering interleaves the bits of the scaled
dimensions so ranges in EITHER column map to a bounded number of
Morton-curve runs — the layout trick behind Delta Lake's
``OPTIMIZE ZORDER BY`` and the classic Morton/Orenstein curve.

Everything here is deterministic integer/double arithmetic on
built-in expressions (shift, and, multiply, floor) — JVM-side,
codegen-friendly, and exactly reproducible in ANSI SQL, so the
registry query value-checks the whole layout computation including
the pruning counts.

Granularity caveat (measured, tests/test_layout.py): a box predicate
centered mid-range straddles all four top-level curve quadrants, so
z-order only out-prunes a single-key stripe once the file count
resolves past that overhead (64 files on the fixture; a 100 TB table
has thousands of files per dimension, far past it). Single-key sort
stays the right layout when queries filter one dominant column.

At cluster scale the flow is: compute ``z``, ``repartitionByRange``
(or write with a range-bucketed key) on it, and let parquet footer
min/max stats do the skipping. The operator models files as
equal-size rank buckets (``ntile`` over the z order) so the
file-count arithmetic is engine-checkable; the write-path test pins
the real thing — actual parquet files whose per-file (a, b) spans
shrink under the z layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits kept per dimension after range scaling. 16x2 = 32-bit Morton
#: codes: plenty of resolution for file-level clustering (a table
#: would need > 2^16 files per dimension before scaling quantization
#: showed up in skipping decisions).
Z_BITS = 16


def scale_to_bits(col: Column, cmin: Column, cmax: Column,
                  bits: int = Z_BITS) -> Column:
    """Map a numeric column onto [0, 2^bits - 1] by its global range
    (floor((x - min) * (2^bits - 1) / (max - min)); constant columns
    map to 0). Exact double arithmetic — engine-portable."""
    top = float((1 << bits) - 1)
    return F.when(
        cmax > cmin,
        F.floor(
            (col.cast("double") - cmin.cast("double"))
            * F.lit(top)
            / (cmax.cast("double") - cmin.cast("double"))
        ),
    ).otherwise(F.lit(0)).cast("long")


def z_interleave(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton code: bit i of ``a`` lands at position 2i, bit i of
    ``b`` at 2i+1. Built from shiftright/bitwiseAND/multiply-by-
    power-of-two literals — max value 2^(2*bits) - 1, ANSI-safe for
    bits <= 31."""
    terms = []
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1).cast("long"))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1).cast("long"))
        terms.append(
            abit * F.lit(1 << (2 * i)).cast("long")
            + bbit * F.lit(1 << (2 * i + 1)).cast("long")
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def with_z_value(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = Z_BITS,
    out_col: str = "z",
) -> DataFrame:
    """Attach the Morton code of (col_a, col_b) scaled by their global
    ranges. The range stats ride a broadcast 1 x 1 cross join (one
    map-side-combined agg pass), never a shuffle of the data."""
    stats = F.broadcast(
        df.agg(
            F.min(col_a).alias("_amin"),
            F.max(col_a).alias("_amax"),
            F.min(col_b).alias("_bmin"),
            F.max(col_b).alias("_bmax"),
        )
    )
    joined = df.crossJoin(stats)
    return joined.withColumn(
        out_col,
        z_interleave(
            scale_to_bits(
                F.col(col_a), F.col("_amin"), F.col("_amax"), bits
            ),
            scale_to_bits(
                F.col(col_b), F.col("_bmin"), F.col("_bmax"), bits
            ),
            bits,
        ),
    ).drop("_amin", "_amax", "_bmin", "_bmax")


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = Z_BITS,
) -> None:
    """The write path: range-partition on the Morton code and write
    one file per range — parquet footers then carry tight (a, b)
    min/max per file and ordinary predicate pushdown skips files for
    box predicates on EITHER column. (repartitionByRange samples; at
    scale pin boundaries via a quantile pass if bit-stable layout
    matters across reruns.)"""
    with_z_value(df, col_a, col_b, bits).repartitionByRange(
        n_files, "z"
    ).write.mode("overwrite").parquet(path)
