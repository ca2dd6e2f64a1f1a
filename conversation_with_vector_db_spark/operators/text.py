"""Vectorized text statistics — size-gated regex counting.

``F.regexp_count`` runs java.util.regex per row inside whole-stage
codegen: zero Python round-trip, unbeatable at fixture scale. But
backtracking Java regex is several-× slower than a linear-time engine
on char-class scans, and the gap compounds with corpus size: at sf10
(500 k docs) the three quality-score counts cost ~18 s on 32 cores
JVM-side, while pyarrow.compute's RE2 engine does the same counts in
~5 s on ONE thread. Past a size threshold the regex work dwarfs the
Arrow worker round-trip, so this module applies the repo's standard
cost-gate discipline (PLANS.md "Cost gates"): JVM below, Arrow/RE2
above, identical values on both branches (pinned by test).

Pattern contract: callers use the common Java/RE2 subset — character
classes, alternation, ``+``/``*``, ASCII ``\\b`` word boundaries (both
engines define ``\\w`` as ASCII ``[A-Za-z0-9_]`` by default). No
backreferences, no lookaround (RE2 has neither). Note the Arrow branch
uses the SAME regex family as the DuckDB oracle (RE2), so oracle
agreement is if anything tighter on that branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Below this on-disk source size the JVM branch wins: the Python
#: worker round-trip plus the under-parallel repartition exceed what
#: RE2 saves on a tiny corpus. Measured r4 (steady exec, warm
#: workers): sf0.01/190 KB JVM 0.25 s vs Arrow 0.24 s (cold 1.8 vs
#: 2.3 — JVM wins one-shot); sf0.1/0.6 MB 0.54 vs 0.20; sf1/3.9 MB
#: 2.0 vs 0.29; sf10/38 MB 18.2 vs 0.6 — the RE2 advantage grows
#: linearly with text volume, so only sub-MB corpora keep the
#: worker-free JVM path. UNKNOWN size picks the Arrow branch:
#: linear-time regex is the branch that survives scale.
ARROW_REGEX_MIN_BYTES = 512 << 10


def with_regex_counts(
    df: DataFrame,
    counts: list[tuple[str, str, bool]],
    text_col: str = "text",
    src_bytes: int | None = None,
) -> DataFrame:
    """Append one BIGINT match-count column per ``(name, pattern,
    lowercase_first)`` spec, counting non-overlapping matches of
    ``pattern`` in ``text_col`` (lowercased first when the flag is
    set — computed once and shared across all lowercase specs).

    Size-gated: below :data:`ARROW_REGEX_MIN_BYTES` (JVM
    ``regexp_count``, no Python round-trip); above or unknown (ONE
    ``mapInPandas`` pass evaluating every pattern with pyarrow's RE2
    per Arrow batch). Both branches produce identical values for
    patterns within the module's stated Java/RE2 common subset.
    """
    small = src_bytes is not None and src_bytes < ARROW_REGEX_MIN_BYTES
    if small:
        out = df
        lowered = F.lower(F.col(text_col))
        for name, pattern, lower in counts:
            src = lowered if lower else F.col(text_col)
            out = out.withColumn(
                name, F.regexp_count(src, F.lit(pattern)).cast("long")
            )
        return out

    base = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    fields = ", ".join(f"{name} long" for name, _, _ in counts)
    schema = f"{base}, {fields}"

    # A narrow map inherits the scan's parallelism; a single-file
    # corpus (the fixture layout) plans as ONE input partition, which
    # would serialize the whole regex pass onto one worker. Spread it
    # to the core count first — only when under-parallel: a
    # many-file cluster-scale table already scans wide and must NOT
    # pay a full-text shuffle here.
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        df = df.repartition(cores)

    names = [f.name for f in df.schema.fields] + [n for n, _, _ in counts]

    def score(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        # mapInArrow, not mapInPandas: the pandas bridge materializes
        # one Python str object per document per pass, which costs
        # more than the regex work it wraps; RE2 runs on the Arrow
        # buffers directly.
        for batch in batches:
            arr = batch.column(text_col)
            low = None
            cols = list(batch.columns)
            for _, pattern, lower in counts:
                if lower and low is None:
                    low = pc.utf8_lower(arr)
                src = low if lower else arr
                cols.append(
                    pc.count_substring_regex(src, pattern).cast(pa.int64())
                )
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return df.mapInArrow(score, schema=schema)
