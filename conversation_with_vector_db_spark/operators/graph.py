"""Graph analytics over edge lists: PageRank (Page et al. 1999) as a
fixed-iteration DataFrame loop — the fifth value-parity iterative
family (Lloyd, recursive chunking, BPE, PCA power iteration, now
PageRank), and the ranking companion to the dedup module's
connected-components operator (that one answers "which nodes form a
group", this one "which nodes matter within the link structure").

Algorithm (the standard damped formulation, dangling mass
redistributed uniformly each step):

    r'(v) = (1-d)/N + d * ( sum_{u -> v} r(u)/outdeg(u) + D/N )

with ``D = sum of r(u) over dangling u`` (no out-edges). Fixed
``iters`` (default 3), no convergence test — the same determinism
trade every iterative family here makes so the oracle can UNROLL the
identical steps in SQL.

Scale shape per iteration: one shuffle — edges join ranks on src
(rank table keyed by node), contributions group by dst. The edge
list never re-shuffles if pre-partitioned by src (the join reuses
that partitioning); the rank frame is node-sized, not edge-sized.
The dangling term is a one-row aggregate broadcast into the update.
``localCheckpoint`` between rounds truncates the lineage exactly like
the connected-components loop — an O(iters)-deep plan, not 2^iters.

Determinism: ranks are plain double arithmetic on (1/N, degrees) —
no RNG; cross-engine sum-order differences are absorbed by the
6dp rounding at the output (ranks live at the 1/N scale, so 4dp
would quantize away real structure on mid-sized graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Node ranks after ``iters`` damped iterations from the uniform
    start. ``edges`` is a directed edge list (duplicates are
    de-duplicated: this is a link-structure algorithm, not a
    multiplicity-weighted one). Returns (node, rank) with rank
    rounded to 6dp."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty graph")
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    is_dangling = F.col("deg").isNull()
    for _ in range(iters):
        ranked = ranks.join(
            deg, ranks["node"] == deg["src"], "left"
        ).select("node", "r", "deg")
        dangling = (
            ranked.where(is_dangling)
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        )
        shares = ranked.where(~is_dangling).select(
            F.col("node").alias("src"),
            (F.col("r") / F.col("deg")).alias("share"),
        )
        # The rank table is NODE-sized while the edge list is
        # EDGE-sized; up to ~10M nodes the shares frame broadcasts
        # (a few hundred MB ceiling) so the per-iteration
        # contribution join never shuffles the edges — past that,
        # shuffle-hash with the edge list pre-partitioned by src.
        if n <= 10_000_000:
            shares = F.broadcast(shares)
        contrib = (
            e.join(shares, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        ranks = (
            nodes.join(
                contrib, nodes["node"] == contrib["dst"], "left"
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("r", 6).alias("rank"))
