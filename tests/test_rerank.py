"""MMR re-ranking (operators/rerank.py): equivalence with a pure-Python
greedy reference, the lambda extremes, and the duplicate-busting
property MMR exists for."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from conversation_with_vector_db_spark.operators.rerank import (
    ROUND_DIGITS,
    mmr_rerank,
)


def _ref_mmr(rows, k, lam):
    """Reference greedy: rows = [(vec_id, rel, vec)], 4-digit rounded
    doc-doc sims, ties by id — the operator's documented contract."""
    rows = sorted(rows, key=lambda r: (-r[1], r[0]))
    mat = np.asarray([r[2] for r in rows], dtype=np.float64)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    dd = np.round(unit @ unit.T, ROUND_DIGITS)
    picked = [0]
    remaining = list(range(1, len(rows)))
    for _ in range(1, min(k, len(rows))):
        best = None
        for i in remaining:
            score = lam * rows[i][1] - (1 - lam) * dd[i, picked].max()
            key = (-score, rows[i][0])
            if best is None or key < best[0]:
                best = (key, i)
        picked.append(best[1])
        remaining.remove(best[1])
    return [rows[i][0] for i in picked]


def _cands_df(spark, per_q):
    rows = [
        (qid, vid, rel, vec)
        for qid, cands in per_q.items()
        for vid, rel, vec in cands
    ]
    return spark.createDataFrame(
        rows,
        "qid long, vec_id long, sim double, embedding array<double>",
    )


def _rand_cands(rng, n, dim=16):
    out = []
    for vid in range(n):
        v = rng.normal(size=dim)
        out.append(
            (vid, round(float(rng.uniform(0, 1)), ROUND_DIGITS),
             [float(x) for x in v])
        )
    return out


def test_matches_reference_greedy_randomized(spark):
    rng = np.random.default_rng(31)
    per_q = {q: _rand_cands(rng, 15) for q in range(4)}
    got = mmr_rerank(
        _cands_df(spark, per_q), k=6, lambda_=0.7
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(
            (r["mmr_rank"], r["vec_id"])
        )
    for q, cands in per_q.items():
        expect = _ref_mmr(cands, 6, 0.7)
        ranked = [v for _, v in sorted(by_q[q])]
        assert ranked == expect, q


def test_lambda_one_is_relevance_order(spark):
    rng = np.random.default_rng(7)
    cands = _rand_cands(rng, 12)
    got = mmr_rerank(
        _cands_df(spark, {0: cands}), k=5, lambda_=1.0
    ).collect()
    ranked = [r["vec_id"] for r in sorted(got, key=lambda r: r["mmr_rank"])]
    expect = [v for v, _, _ in sorted(cands, key=lambda c: (-c[1], c[0]))][:5]
    assert ranked == expect


def test_busts_duplicate_clusters(spark):
    """Three tight clusters of near-duplicates; raw relevance order
    would spend all of k on cluster A — MMR must cover all three."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(3, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    cands = []
    vid = 0
    for c, rel0 in ((0, 0.99), (1, 0.80), (2, 0.60)):
        for j in range(5):
            vec = base[c] + rng.normal(size=16) * 0.01
            cands.append(
                (vid, round(rel0 - 0.001 * j, 4),
                 [float(x) for x in vec])
            )
            vid += 1
    got = mmr_rerank(
        _cands_df(spark, {0: cands}), k=3, lambda_=0.5
    ).collect()
    picked = [r["vec_id"] for r in got]
    clusters = {v // 5 for v in picked}
    assert clusters == {0, 1, 2}, picked


def test_k_exceeding_group_size_returns_group(spark):
    rng = np.random.default_rng(3)
    cands = _rand_cands(rng, 4)
    got = mmr_rerank(_cands_df(spark, {9: cands}), k=10).collect()
    assert len(got) == 4
    assert sorted(r["mmr_rank"] for r in got) == [1, 2, 3, 4]
