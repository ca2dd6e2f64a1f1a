"""zorder_rewrite (sources/transactional.py): rows preserved, stats
narrow after clustering, upserts prune to the clustered bucket, tags
survive, and compaction composes."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from conversation_with_vector_db_spark.sources import transactional as tx
from conversation_with_vector_db_spark.sources.snapshot_log import (
    latest_version,
    live_segments,
    segment_stats,
)


@pytest.fixture()
def tdir():
    yield os.path.join(
        tempfile.gettempdir(), "cvdb_zr_test", uuid.uuid4().hex
    )


def _mk_scattered(spark, tdir, n=400):
    # Keys arrive in hash-scattered order: every initial segment's
    # (min, max) covers nearly the whole domain.
    df = spark.createDataFrame(
        [((i * 193) % n, i % 7, 0) for i in range(n)],
        "vec_id: long, label: int, namespace: int",
    ).repartition(8)
    tx.create_partitioned_table(spark, df, tdir)
    # Seed per-segment key stats via a no-op-ish keyed upsert of one
    # row so stats exist... instead: rewrite through zorder later
    # recomputes; here return expected state.
    return {((i * 193) % n, 0): i % 7 for i in range(n)}


def _state(spark, tdir):
    return {
        (r["vec_id"], r["namespace"]): r["label"]
        for r in tx.read_table(spark, tdir).collect()
    }


def test_rows_and_tags_preserved(spark, tdir):
    want = _mk_scattered(spark, tdir)
    tx.zorder_rewrite(spark, tdir, by=("vec_id",), key="vec_id")
    assert _state(spark, tdir) == want
    segs = live_segments(tdir, latest_version(tdir))
    assert all("namespace=0" in s for s in segs)
    assert len(segs) == 8  # n_buckets default


def test_stats_become_disjoint_and_narrow(spark, tdir):
    _mk_scattered(spark, tdir)
    tx.zorder_rewrite(
        spark, tdir, by=("vec_id",), key="vec_id", n_buckets=4
    )
    stats = segment_stats(tdir, latest_version(tdir))
    segs = live_segments(tdir, latest_version(tdir))
    ranges = sorted(
        (stats[s]["min"], stats[s]["max"]) for s in segs
    )
    assert len(ranges) == 4
    # Consecutive bucket ranges never overlap (ntile on the key).
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
        assert lo1 <= hi1


def test_upsert_after_clustering_prunes_probes(spark, tdir):
    _mk_scattered(spark, tdir)
    tx.zorder_rewrite(
        spark, tdir, by=("vec_id",), key="vec_id", n_buckets=8
    )
    before = set(live_segments(tdir, latest_version(tdir)))
    # Update three adjacent keys: the recorded ranges confine the
    # rewrite to exactly one clustered segment.
    ups = spark.createDataFrame(
        [(10, 99, 0), (11, 99, 0), (12, 99, 0)],
        "vec_id: long, label: int, namespace: int",
    )
    tx.upsert_by_key(spark, tdir, ups, key="vec_id")
    after = set(live_segments(tdir, latest_version(tdir)))
    assert len(before - after) == 1, (
        "keyed upsert should rewrite exactly the one clustered "
        f"segment, rewrote {len(before - after)}"
    )
    assert _state(spark, tdir)[(10, 0)] == 99


def test_two_column_morton_clustering(spark, tdir):
    df = spark.createDataFrame(
        [(i, (i * 37) % 100, i % 50, 0) for i in range(300)],
        "vec_id: long, x: int, y: int, namespace: int",
    ).repartition(6)
    tx.create_partitioned_table(spark, df, tdir)
    want = _state_xy(spark, tdir)
    tx.zorder_rewrite(
        spark, tdir, by=("x", "y"), key="vec_id", n_buckets=4
    )
    assert _state_xy(spark, tdir) == want
    assert len(live_segments(tdir, latest_version(tdir))) == 4


def _state_xy(spark, tdir):
    return {
        r["vec_id"]: (r["x"], r["y"])
        for r in tx.read_table(spark, tdir).collect()
    }


def test_composes_with_binpack_compaction(spark, tdir):
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        compact_snapshots,
    )

    want = _mk_scattered(spark, tdir)
    tx.zorder_rewrite(
        spark, tdir, by=("vec_id",), key="vec_id", n_buckets=8
    )
    compact_snapshots(spark, tdir, target_bytes=1 << 30)
    assert _state(spark, tdir) == want
