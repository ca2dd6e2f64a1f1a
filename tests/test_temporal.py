"""asof_join edge semantics (operators/temporal.py): boundary
inclusion, tie-breaking, tolerance, and the no-match NULL — each
pinned against a hand-computed model."""

from __future__ import annotations

from pyspark.sql import functions as F

from conversation_with_vector_db_spark.operators.temporal import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 200, "p2"), (2, 50, "p3"), (3, 10, "p4")],
        "k long, t long, name string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "name")
    right = spark.createDataFrame(
        [
            (1, 100, 11),   # exactly at p1's ts
            (1, 100, 12),   # tie on (k, ts): higher id must win
            (1, 150, 13),
            (2, 60, 21),    # after p3: never matches
        ],
        "k long, t long, rid long",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "rid")
    return left, right


def _collect(df):
    return {
        r["name"]: (
            None if r["_asof"] is None else r["_asof"]["rid"]
        )
        for r in df.collect()
    }


def test_asof_inclusive_tiebreak_and_no_match(spark):
    left, right = _frames(spark)
    got = _collect(
        asof_join(left, right, on="k", ts="ts",
                  right_cols=("ts", "rid"), tiebreak="rid")
    )
    # p1: ties at its exact ts -> greatest rid (12); p2: latest prior
    # is 150/13; p3: the only right row is later -> NULL; p4: no right
    # rows for its key at all -> NULL.
    assert got == {"p1": 12, "p2": 13, "p3": None, "p4": None}


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    got = _collect(
        asof_join(left, right, on="k", ts="ts",
                  right_cols=("ts", "rid"), tiebreak="rid", strict=True)
    )
    # p1's equal-ts rows no longer qualify and it has nothing earlier.
    assert got == {"p1": None, "p2": 13, "p3": None, "p4": None}


def test_asof_tolerance_voids_stale_matches(spark):
    left, right = _frames(spark)
    got = _collect(
        asof_join(left, right, on="k", ts="ts",
                  right_cols=("ts", "rid"), tiebreak="rid",
                  tolerance_sec=30.0)
    )
    # p2's latest match is 50s old -> voided; p1's is 0s old -> kept.
    assert got == {"p1": 12, "p2": None, "p3": None, "p4": None}


def test_asof_matches_bruteforce_on_random_data(spark):
    """Randomized cross-check: union-and-window result equals the
    quadratic reference (max-ts, then max-id, right row per left row)
    on seeded data with shared keys, ties, and unmatched keys."""
    import random

    rng = random.Random(5)
    lrows = [(rng.randrange(6), rng.randrange(50)) for _ in range(80)]
    rrows = [
        (rng.randrange(6), rng.randrange(50), i) for i in range(120)
    ]
    left = spark.createDataFrame(
        [(k, t, f"L{i}") for i, (k, t) in enumerate(lrows)],
        "k long, t long, name string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "name")
    right = spark.createDataFrame(
        rrows, "k long, t long, rid long"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "rid")
    got = _collect(
        asof_join(left, right, on="k", ts="ts",
                  right_cols=("ts", "rid"), tiebreak="rid")
    )
    want = {}
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, rid) for rk, rt, rid in rrows
                 if rk == k and rt <= t]
        want[f"L{i}"] = max(cands)[1] if cands else None
    assert got == want


# ---- interval_bucket_join ------------------------------------------------

from conversation_with_vector_db_spark.operators.temporal import (  # noqa: E402
    interval_bucket_join,
)


def _ib_frames(spark, pts, ivs):
    p = spark.createDataFrame(
        pts, "k long, t long, pid long"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "pid")
    i = spark.createDataFrame(
        ivs, "k long, tlo long, thi long, iid long"
    ).select(
        "k",
        F.timestamp_seconds("tlo").alias("lo"),
        F.timestamp_seconds("thi").alias("hi"),
        "iid",
    )
    return p, i


def _pairs(df):
    return {(r["pid"], r["iid"]) for r in df.select("pid", "iid").collect()}


def test_interval_join_boundaries(spark):
    # bucket = 100 s; interval [100, 200) on key 1.
    pts = [(1, 100, 1), (1, 199, 2), (1, 200, 3), (1, 99, 4), (2, 150, 5)]
    ivs = [(1, 100, 200, 10)]
    p, i = _ib_frames(spark, pts, ivs)
    got = _pairs(
        interval_bucket_join(p, i, on="k", bucket_width_us=100_000_000)
    )
    # lo inclusive, hi exclusive, other-key point never matches.
    assert got == {(1, 10), (2, 10)}


def test_interval_join_interval_ending_on_cell_boundary(spark):
    # hi == exact cell boundary: the interval must NOT reach the next
    # cell (the hi-1 in the explode bound).
    pts = [(1, 200, 1)]
    ivs = [(1, 0, 200, 10)]
    p, i = _ib_frames(spark, pts, ivs)
    got = _pairs(
        interval_bucket_join(p, i, on="k", bucket_width_us=100_000_000)
    )
    assert got == set()


def test_interval_join_wide_interval_no_duplicate_pairs(spark):
    # Interval spanning 5 cells; point inside matches EXACTLY once.
    pts = [(1, 250, 1)]
    ivs = [(1, 0, 500, 10)]
    p, i = _ib_frames(spark, pts, ivs)
    df = interval_bucket_join(p, i, on="k", bucket_width_us=100_000_000)
    rows = df.select("pid", "iid").collect()
    assert len(rows) == 1 and (rows[0]["pid"], rows[0]["iid"]) == (1, 10)


def test_interval_join_matches_bruteforce_on_random_data(spark):
    import numpy as np

    rng = np.random.default_rng(57)
    pts = [
        (int(rng.integers(0, 4)), int(rng.integers(0, 5000)), pid)
        for pid in range(300)
    ]
    ivs = []
    for iid in range(60):
        lo = int(rng.integers(0, 4800))
        ivs.append(
            (int(rng.integers(0, 4)), lo,
             lo + int(rng.integers(0, 400)), 1000 + iid)
        )
    p, i = _ib_frames(spark, pts, ivs)
    got = _pairs(
        interval_bucket_join(p, i, on="k", bucket_width_us=150_000_000)
    )
    expect = {
        (pid, iid)
        for (pk, pt, pid) in pts
        for (ik, lo, hi, iid) in ivs
        if pk == ik and lo <= pt < hi
    }
    assert got == expect


def test_interval_join_plan_has_no_nested_loop(spark):
    pts = [(1, 100, 1)]
    ivs = [(1, 50, 150, 10)]
    p, i = _ib_frames(spark, pts, ivs)
    df = interval_bucket_join(p, i, on="k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_sessionize_boundary_and_ordinals(spark):
    """Gap exactly == gap_us stays in the session (TTL refreshed on
    activity); gap_us + 1 opens a new one; ordinals are per-key and
    1-based."""
    from conversation_with_vector_db_spark.operators.temporal import (
        sessionize,
    )

    g = 900 * 1_000_000
    rows = [
        (1, 0, 1),
        (1, g, 2),          # exactly the TTL later: same session
        (1, 2 * g + 1, 3),  # one microsecond past: new session
        (2, 5, 4),          # independent key restarts at 1
    ]
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(
            spark.createDataFrame(
                rows, "user_id long, us long, event_id long"
            )
        ).collect()
    }
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1}


def test_sessionize_tied_timestamps_never_split(spark):
    """Two events sharing the boundary-opening timestamp land in the
    SAME (new) session regardless of partitioning: the zero gap can't
    flag, and the running sum replays the (ts, tiebreak) order."""
    from conversation_with_vector_db_spark.operators.temporal import (
        sessionize,
    )

    g = 900 * 1_000_000
    rows = [(1, 0, 1), (1, 2 * g, 3), (1, 2 * g, 2)]
    for parts in (1, 7):
        df = spark.createDataFrame(
            rows, "user_id long, us long, event_id long"
        ).repartition(parts)
        got = {
            r["event_id"]: r["session_id"]
            for r in sessionize(df).collect()
        }
        assert got == {1: 1, 2: 2, 3: 2}
