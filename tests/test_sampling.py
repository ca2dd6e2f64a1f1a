"""Weighted priority sampling (operators/sampling.py): exactness vs a
Python reference, weight-monotone inclusion, clamping, determinism."""

from __future__ import annotations

import hashlib

from conversation_with_vector_db_spark.operators.sampling import (
    PRIORITY_SHIFT,
    weighted_priority_sample,
    with_priority,
)


def _py_priority(item_id, weight, salt="ws"):
    u = int(
        hashlib.md5(f"{salt}:{item_id}".encode()).hexdigest()[:8], 16
    )
    return (u * PRIORITY_SHIFT) // max(int(weight), 1)


def test_priorities_match_python_reference(spark):
    rows = [(i, 1 + (i * 37) % 900) for i in range(200)]
    df = spark.createDataFrame(rows, "id: long, w: long")
    got = {
        r["id"]: r["priority"]
        for r in with_priority(df, "w", "id").collect()
    }
    for i, w in rows:
        assert got[i] == _py_priority(i, w), (i, w)


def test_sample_is_smallest_k_with_id_ties(spark):
    rows = [(i, 10) for i in range(100)]
    df = spark.createDataFrame(rows, "id: long, w: long")
    want = sorted(
        ((_py_priority(i, 10), i) for i, _ in rows)
    )[:7]
    got = [
        (r["priority"], r["id"])
        for r in weighted_priority_sample(df, "w", 7, "id").collect()
    ]
    assert got == want


def test_inclusion_rate_grows_with_weight():
    """Distribution property of the scheme itself (pure Python replay
    of the exact integer arithmetic): across 200 salts, weight-20
    items must be sampled far more often than weight-1 items."""
    n, k = 60, 10
    heavy = set(range(0, n, 3))  # every third item is heavy
    hits_h = hits_l = 0
    for s in range(200):
        pri = sorted(
            (
                _py_priority(i, 20 if i in heavy else 1, salt=f"s{s}"),
                i,
            )
            for i in range(n)
        )[:k]
        for _, i in pri:
            if i in heavy:
                hits_h += 1
            else:
                hits_l += 1
    rate_h = hits_h / (200 * len(heavy))
    rate_l = hits_l / (200 * (n - len(heavy)))
    assert rate_h > 4 * rate_l, (rate_h, rate_l)


def test_weight_clamp_and_k_past_n(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, None), (4, 7)], "id: long, w: long"
    )
    rows = weighted_priority_sample(df, "w", 100, "id").collect()
    assert len(rows) == 4
    by_id = {r["id"]: r["priority"] for r in rows}
    # 0 / negative / NULL weights clamp to 1, never divide-by-zero.
    for i in (1, 2, 3):
        assert by_id[i] == _py_priority(i, 1)
    assert by_id[4] == _py_priority(4, 7)


def test_append_stability(spark):
    """An item's priority is independent of the rest of the corpus:
    adding rows can only move the cutoff, never reorder survivors."""
    base = spark.createDataFrame(
        [(i, 5) for i in range(30)], "id: long, w: long"
    )
    more = spark.createDataFrame(
        [(i, 5) for i in range(30, 60)], "id: long, w: long"
    )
    s2 = [
        (r["priority"], r["id"])
        for r in weighted_priority_sample(
            base.unionByName(more), "w", 10, "id"
        ).collect()
    ]
    # The combined sample is exactly the 10 smallest of the union of
    # the two tables' independently-computed priorities.
    full = {
        (r["priority"], r["id"])
        for r in with_priority(base, "w", "id").collect()
    } | {
        (r["priority"], r["id"])
        for r in with_priority(more, "w", "id").collect()
    }
    assert s2 == sorted(full)[:10]
