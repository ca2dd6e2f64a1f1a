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
The deduplicated edge list, node set, and out-degree table are
persisted (:func:`~.cache.scoped_cache`) before the loop:
localCheckpoint truncates only the RANK lineage, so without the
cache every iteration would re-run the edge-dedup shuffle from the
source scan — measured at sf1 (12M raw edges): 48.9 s → cached
edge index, one dedup total.

Determinism: ranks are plain double arithmetic on (1/N, degrees) —
no RNG; cross-engine sum-order differences are absorbed by the
6dp rounding at the output (ranks live at the 1/N scale, so 4dp
would quantize away real structure on mid-sized graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import scoped_cache


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
    # Cached PRE-PARTITIONED BY dst: the per-iteration contribution
    # aggregate groups by dst after a broadcast join (which preserves
    # the streamed side's partitioning), and HashPartitioning(dst)
    # satisfies the aggregate's clustered distribution — so every
    # iteration runs EXCHANGE-FREE off the cache; the one dst shuffle
    # happens once, at index build.
    e = scoped_cache(
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        )
        .distinct()
        .repartition("dst")
    )
    nodes = scoped_cache(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty graph")
    deg = scoped_cache(
        e.groupBy("src").agg(F.count("*").alias("deg"))
    )
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


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007): every
    node starts as its own label; each round it adopts the MOST
    FREQUENT label among its in-neighbors, ties broken by the
    smallest label — a deterministic argmax, so the oracle replays
    the rounds with a windowed row_number. Fixed ``iters``, no
    convergence test (synchronous LPA can oscillate on bipartite
    structure; a fixed unrolled horizon is the determinism trade
    every iterative family here makes, and the tie-break makes each
    round a pure function of the last). The deduplicated edge list
    persists (:func:`~.cache.scoped_cache`) before the loop — the
    same re-dedup-per-round fix as :func:`pagerank` (31.9 s → one
    dedup at sf1).

    Community detection vs :func:`~..dedup.connected_components`'
    connectivity: CC's min-label convergence answers "can these
    nodes reach each other at all"; frequency voting answers "where
    is the density" — two components of one near-dup graph stay
    separate under CC but a weakly-bridged dense pair splits under
    LPA.

    Scale shape per round: edges join labels on src (node-sized
    label table broadcasts under the same <=10M gate PageRank uses),
    one (dst, label) count aggregation, then the per-dst argmax as
    ``min(struct(-cnt, lbl))`` — a HASH aggregate whose map-side
    partials collapse each partition to one candidate per dst before
    the shuffle (struct ordering is lexicographic, so the min is
    exactly "highest count, then smallest label" — the same
    deterministic tie-break the oracle's row_number replays), where a
    rank window would sort the full (dst, label, cnt) frame. Isolated
    label table rows never grow past the node count."""
    # Pre-partitioned by dst for the same exchange-free rounds as
    # :func:`pagerank`: HashPartitioning(dst) satisfies both the
    # (dst, lbl) count's and the per-dst argmax's distributions, and
    # the broadcast label join preserves it.
    e = scoped_cache(
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        )
        .distinct()
        .repartition("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("label_propagation: empty graph")
    labels = nodes.withColumn("lbl", F.col("node"))

    for _ in range(iters):
        lab_src = labels.select(
            F.col("node").alias("src"), "lbl"
        )
        if n <= 10_000_000:
            lab_src = F.broadcast(lab_src)
        counts = (
            e.join(lab_src, "src")
            .groupBy("dst", "lbl")
            .agg(F.count("*").alias("cnt"))
        )
        pick = (
            counts.groupBy("dst")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("lbl").alias("l"),
                    )
                ).alias("m")
            )
            .select(
                F.col("dst").alias("node"), F.col("m.l").alias("_new")
            )
        )
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("_new"), F.col("lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=False)
        )
    return labels
