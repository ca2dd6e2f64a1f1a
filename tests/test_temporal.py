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
