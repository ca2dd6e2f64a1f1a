"""merge_into (sources/transactional.py): SQL MERGE clause semantics,
clause-order priority, source-duplicate rejection, partition pruning,
and identity scoping."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from conversation_with_vector_db_spark.sources import transactional as tx
from conversation_with_vector_db_spark.sources.snapshot_log import (
    live_segments,
    latest_version,
)


@pytest.fixture()
def tdir():
    d = os.path.join(
        tempfile.gettempdir(), "cvdb_merge_test", uuid.uuid4().hex
    )
    yield d


def _mk(spark, tdir, rows):
    df = spark.createDataFrame(
        rows, "vec_id: long, label: int, namespace: int"
    )
    tx.create_partitioned_table(spark, df, tdir)
    return df


def _state(spark, tdir):
    return {
        (r["vec_id"], r["namespace"]): r["label"]
        for r in tx.read_table(spark, tdir).collect()
    }


def test_three_clause_merge(spark, tdir):
    _mk(
        spark,
        tdir,
        [(1, 2, 0), (2, 3, 0), (3, 4, 1), (4, 5, 1)],
    )
    src = spark.createDataFrame(
        [
            (1, 100, 0),  # matched, even target label -> update
            (2, 100, 0),  # matched, odd target label  -> delete
            (9, 100, 1),  # unmatched -> insert
        ],
        "vec_id: long, label: int, namespace: int",
    )
    tx.merge_into(
        spark,
        tdir,
        src,
        key="vec_id",
        matched=(
            ("update", "t.label % 2 = 0", None),
            ("delete", None, None),
        ),
    )
    assert _state(spark, tdir) == {
        (1, 0): 100,  # updated
        (3, 1): 4,    # untouched
        (4, 1): 5,    # untouched
        (9, 1): 100,  # inserted
    }


def test_clause_order_priority(spark, tdir):
    # Row satisfies BOTH clauses; the first (update) must win.
    _mk(spark, tdir, [(1, 2, 0)])
    src = spark.createDataFrame(
        [(1, 50, 0)], "vec_id: long, label: int, namespace: int"
    )
    tx.merge_into(
        spark,
        tdir,
        src,
        key="vec_id",
        matched=(
            ("update", "t.label = 2", None),
            ("delete", "s.label = 50", None),
        ),
        insert=False,
    )
    assert _state(spark, tdir) == {(1, 0): 50}


def test_set_map_partial_update(spark, tdir):
    _mk(spark, tdir, [(1, 2, 0)])
    src = spark.createDataFrame(
        [(1, 7, 0)], "vec_id: long, label: int, namespace: int"
    )
    tx.merge_into(
        spark,
        tdir,
        src,
        key="vec_id",
        matched=(
            ("update", None, {"label": "t.label + s.label * 10"}),
        ),
        insert=False,
    )
    assert _state(spark, tdir) == {(1, 0): 72}


def test_duplicate_source_identity_rejected(spark, tdir):
    _mk(spark, tdir, [(1, 2, 0)])
    src = spark.createDataFrame(
        [(1, 5, 0), (1, 6, 0)],
        "vec_id: long, label: int, namespace: int",
    )
    with pytest.raises(ValueError, match="duplicate identity"):
        tx.merge_into(spark, tdir, src, key="vec_id")
    # Same key in DIFFERENT partitions is a legal source.
    src2 = spark.createDataFrame(
        [(1, 5, 0), (1, 6, 1)],
        "vec_id: long, label: int, namespace: int",
    )
    tx.merge_into(spark, tdir, src2, key="vec_id")
    assert _state(spark, tdir) == {(1, 0): 5, (1, 1): 6}


def test_identity_is_partition_scoped(spark, tdir):
    # Key 1 exists in namespace 0; source key 1 in namespace 1 is
    # UNMATCHED (identity = (partition, key)) and inserts there.
    _mk(spark, tdir, [(1, 2, 0)])
    src = spark.createDataFrame(
        [(1, 9, 1)], "vec_id: long, label: int, namespace: int"
    )
    tx.merge_into(spark, tdir, src, key="vec_id")
    assert _state(spark, tdir) == {(1, 0): 2, (1, 1): 9}


def test_insert_condition_and_insert_off(spark, tdir):
    _mk(spark, tdir, [(1, 2, 0)])
    src = spark.createDataFrame(
        [(5, 10, 0), (6, 11, 0)],
        "vec_id: long, label: int, namespace: int",
    )
    tx.merge_into(
        spark,
        tdir,
        src,
        key="vec_id",
        insert_condition="s.label % 2 = 0",
    )
    assert _state(spark, tdir) == {(1, 0): 2, (5, 0): 10}
    tx.merge_into(
        spark,
        tdir,
        spark.createDataFrame(
            [(7, 1, 0)], "vec_id: long, label: int, namespace: int"
        ),
        key="vec_id",
        insert=False,
    )
    assert (7, 0) not in _state(spark, tdir)


def test_untouched_partition_segments_survive_unrewritten(spark, tdir):
    _mk(
        spark,
        tdir,
        [(1, 2, 0), (2, 3, 1), (3, 4, 2)],
    )
    before = set(live_segments(tdir, latest_version(tdir)))
    other = {
        s for s in before if "namespace=1" in s or "namespace=2" in s
    }
    assert other, "fixture should partition-tag segments"
    src = spark.createDataFrame(
        [(1, 99, 0)], "vec_id: long, label: int, namespace: int"
    )
    tx.merge_into(spark, tdir, src, key="vec_id", insert=False)
    after = set(live_segments(tdir, latest_version(tdir)))
    # Partitions 1 and 2 keep their exact physical segments.
    assert other <= after
    assert _state(spark, tdir)[(1, 0)] == 99


def test_merge_into_empty_match_is_insert_only(spark, tdir):
    _mk(spark, tdir, [(1, 2, 0)])
    src = spark.createDataFrame(
        [(100, 9, 3)], "vec_id: long, label: int, namespace: int"
    )
    # Key range [100, 100] misses every recorded range -> no segment
    # read, pure insert commit.
    tx.merge_into(spark, tdir, src, key="vec_id")
    assert _state(spark, tdir) == {(1, 0): 2, (100, 3): 9}


def test_update_all_requires_full_source_row(spark, tdir):
    _mk(spark, tdir, [(1, 2, 0)])
    src = spark.createDataFrame(
        [(1, 0)], "vec_id: long, namespace: int"
    )
    with pytest.raises(ValueError, match="lacks target columns"):
        tx.merge_into(spark, tdir, src, key="vec_id")
    # With explicit set_map + insert off, a narrow source is fine.
    tx.merge_into(
        spark,
        tdir,
        src,
        key="vec_id",
        matched=(("update", None, {"label": "t.label + 1"}),),
        insert=False,
    )
    assert _state(spark, tdir) == {(1, 0): 3}


def test_delete_all_matched(spark, tdir):
    _mk(spark, tdir, [(1, 2, 0), (2, 3, 0)])
    src = spark.createDataFrame(
        [(1, 0, 0), (2, 0, 0)],
        "vec_id: long, label: int, namespace: int",
    )
    tx.merge_into(
        spark,
        tdir,
        src,
        key="vec_id",
        matched=(("delete", None, None),),
        insert=False,
    )
    # The table is now empty: no live base segments remain (read_table
    # refuses an empty selection by design).
    from conversation_with_vector_db_spark.sources.transactional import (
        _is_log,
    )

    assert [
        s
        for s in live_segments(tdir, latest_version(tdir))
        if not _is_log(s)
    ] == []


def test_delete_where_prunes_to_hit_segments(spark, tdir):
    _mk(
        spark,
        tdir,
        [(1, 2, 0), (2, 9, 0), (3, 2, 1), (4, 2, 2)],
    )
    before = set(live_segments(tdir, latest_version(tdir)))
    untouched = {
        s for s in before if "namespace=1" in s or "namespace=2" in s
    }
    assert untouched
    tx.delete_where(spark, tdir, "label = 9")
    after = set(live_segments(tdir, latest_version(tdir)))
    # Only the namespace=0 segment (the one containing label 9) was
    # rewritten; the rest are physically identical.
    assert untouched <= after
    assert _state(spark, tdir) == {(1, 0): 2, (3, 1): 2, (4, 2): 2}


def test_delete_where_no_match_commits_nothing(spark, tdir):
    _mk(spark, tdir, [(1, 2, 0)])
    v = latest_version(tdir)
    assert tx.delete_where(spark, tdir, "label = 777") == v
    assert latest_version(tdir) == v


def test_delete_where_null_predicate_keeps_row(spark, tdir):
    df = spark.createDataFrame(
        [(1, None, 0), (2, 9, 0)],
        "vec_id: long, label: int, namespace: int",
    )
    tx.create_partitioned_table(spark, df, tdir)
    # label > 5 is NULL for vec_id 1: SQL DELETE only removes TRUE.
    tx.delete_where(spark, tdir, "label > 5")
    assert _state(spark, tdir) == {(1, 0): None}


def test_delete_where_cross_partition_predicate(spark, tdir):
    _mk(
        spark,
        tdir,
        [(1, 2, 0), (2, 2, 1), (3, 7, 1), (4, 2, 2)],
    )
    tx.delete_where(spark, tdir, "label = 2 AND namespace >= 1")
    assert _state(spark, tdir) == {(1, 0): 2, (3, 1): 7}


def test_table_changes_classifies_and_reads_only_delta(spark, tdir):
    _mk(
        spark,
        tdir,
        [(1, 2, 0), (2, 3, 0), (3, 4, 1), (4, 5, 2)],
    )
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        latest_version as lv,
    )

    v0 = lv(tdir)
    # Update key 1, delete key 2, insert key 9 — all in namespace 0.
    tx.merge_into(
        spark,
        tdir,
        spark.createDataFrame(
            [(1, 100, 0), (2, 0, 0), (9, 7, 0)],
            "vec_id: long, label: int, namespace: int",
        ),
        key="vec_id",
        matched=(
            ("update", "s.vec_id = 1", None),
            ("delete", None, None),
        ),
    )
    ch = tx.table_changes(spark, tdir, v0, key="vec_id")
    got = {
        (r["_change_type"], r["vec_id"], r["label"])
        for r in ch.collect()
    }
    assert got == {
        ("update_preimage", 1, 2),
        ("update_postimage", 1, 100),
        ("delete", 2, 3),
        ("insert", 9, 7),
    }
    # The feed's scan reads only the delta segments (namespace 0's
    # before/after), never namespaces 1 and 2.
    files = ch.inputFiles()
    assert files and all(
        "namespace=1" not in f and "namespace=2" not in f
        for f in files
    )


def test_table_changes_pure_rewrite_is_empty(spark, tdir):
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        compact_snapshots,
        latest_version as lv,
    )

    _mk(spark, tdir, [(i, i % 5, 0) for i in range(50)])
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(100 + i, 1, 0) for i in range(10)],
            "vec_id: long, label: int, namespace: int",
        ),
        tdir,
    )
    v0 = lv(tdir)
    compact_snapshots(spark, tdir, target_bytes=1 << 30)
    assert lv(tdir) > v0
    # Compaction rewrote segments but changed no rows: empty feed.
    assert tx.table_changes(spark, tdir, v0, key="vec_id").count() == 0


def test_table_changes_zorder_is_invisible_too(spark, tdir):
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        latest_version as lv,
    )

    _mk(spark, tdir, [((i * 193) % 60, i % 5, 0) for i in range(60)])
    v0 = lv(tdir)
    tx.zorder_rewrite(spark, tdir, by=("vec_id",), key="vec_id")
    assert tx.table_changes(spark, tdir, v0, key="vec_id").count() == 0


@pytest.mark.heavy
def test_cdf_replication_loop_converges(spark, tdir):
    """CDC replication end to end: a downstream replica follows the
    source purely through table_changes ranges applied with
    merge_into — after every round the replica equals the source,
    including through a compaction (whose feed is empty)."""
    import os
    import uuid as _uuid

    from conversation_with_vector_db_spark.sources.snapshot_log import (
        compact_snapshots,
        latest_version as lv,
    )

    src = tdir
    dst = tdir + "_replica"
    _mk(spark, src, [(1, 2, 0), (2, 3, 1), (3, 4, 2)])
    tx.create_partitioned_table(
        spark, tx.read_table(spark, src), dst
    )
    cursor = lv(src)

    def replicate():
        nonlocal cursor
        head = lv(src)
        if head == cursor:
            return
        ch = tx.table_changes(spark, src, cursor, head, key="vec_id")
        # Deletes and upserts apply separately; postimages carry the
        # full row so update == upsert on the replica.
        dels = ch.where(F.col("_change_type") == "delete").drop(
            "_change_type"
        )
        ups = ch.where(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop("_change_type")
        if dels.limit(1).count():
            tx.merge_into(
                spark,
                dst,
                dels,
                key="vec_id",
                matched=(("delete", None, None),),
                insert=False,
            )
        if ups.limit(1).count():
            tx.merge_into(spark, dst, ups, key="vec_id")
        cursor = head

    def assert_synced():
        assert _state(spark, src) == _state(spark, dst)

    # Round 1: updates + inserts.
    tx.upsert_by_key(
        spark,
        src,
        spark.createDataFrame(
            [(1, 100, 0), (9, 7, 1)],
            "vec_id: long, label: int, namespace: int",
        ),
        key="vec_id",
    )
    replicate()
    assert_synced()

    # Round 2: deletes.
    tx.delete_by_key(
        spark,
        src,
        spark.createDataFrame([(2,)], "vec_id: long"),
        key="vec_id",
    )
    replicate()
    assert_synced()

    # Round 3: compaction on the source — empty feed, replica
    # untouched, still synced.
    v_before_dst = lv(dst)
    compact_snapshots(spark, src, target_bytes=1 << 30)
    replicate()
    assert lv(dst) == v_before_dst
    assert_synced()

    # Round 4: predicate delete + merge in one range.
    tx.delete_where(spark, src, "label >= 100")
    tx.merge_into(
        spark,
        src,
        spark.createDataFrame(
            [(3, 44, 2), (12, 5, 0)],
            "vec_id: long, label: int, namespace: int",
        ),
        key="vec_id",
    )
    replicate()
    assert_synced()


SCHEMA3 = "vec_id: long, label: int, namespace: int"


def test_nmbs_delete_syncs_target_to_source(spark, tdir):
    """update-all + insert + NOT MATCHED BY SOURCE delete = full
    table sync: after the merge the target IS the source — including
    deletions in partitions the source never names (which segment
    pruning would have skipped; its presence must disable pruning)."""
    _mk(spark, tdir, [(1, 2, 0), (2, 3, 1), (3, 4, 2), (4, 5, 2)])
    src = spark.createDataFrame(
        [(1, 100, 0), (9, 7, 1)], SCHEMA3
    )  # namespaces 0 and 1 only: rows in namespace 2 must still go
    tx.merge_into(
        spark,
        tdir,
        src,
        key="vec_id",
        not_matched_by_source=(("delete", None, None),),
    )
    assert _state(spark, tdir) == {(1, 0): 100, (9, 1): 7}


def test_nmbs_conditional_delete_and_update(spark, tdir):
    _mk(spark, tdir, [(1, 2, 0), (2, 3, 0), (3, -4, 0)])
    src = spark.createDataFrame([(1, 50, 0)], SCHEMA3)
    # Unmatched target rows: delete negatives, stale-mark the rest.
    tx.merge_into(
        spark,
        tdir,
        src,
        key="vec_id",
        insert=False,
        not_matched_by_source=(
            ("delete", "t.label < 0", None),
            ("update", None, {"label": "t.label + 1000"}),
        ),
    )
    assert _state(spark, tdir) == {(1, 0): 50, (2, 0): 1003}


def test_nmbs_first_clause_wins(spark, tdir):
    _mk(spark, tdir, [(1, 10, 0)])
    src = spark.createDataFrame([(99, 1, 0)], SCHEMA3)
    tx.merge_into(
        spark,
        tdir,
        src,
        key="vec_id",
        insert=False,
        not_matched_by_source=(
            ("update", "t.label >= 0", {"label": "t.label * 2"}),
            ("delete", None, None),  # unreachable for label>=0
        ),
    )
    assert _state(spark, tdir) == {(1, 0): 20}


def test_nmbs_update_requires_set_map(spark, tdir):
    _mk(spark, tdir, [(1, 10, 0)])
    src = spark.createDataFrame([(1, 11, 0)], SCHEMA3)
    with pytest.raises(ValueError, match="set_map"):
        tx.merge_into(
            spark,
            tdir,
            src,
            key="vec_id",
            not_matched_by_source=(("update", None, None),),
        )


def test_nmbs_noop_when_all_matched(spark, tdir):
    _mk(spark, tdir, [(1, 2, 0), (2, 3, 1)])
    src = spark.createDataFrame([(1, 100, 0), (2, 200, 1)], SCHEMA3)
    tx.merge_into(
        spark,
        tdir,
        src,
        key="vec_id",
        not_matched_by_source=(("delete", None, None),),
    )
    assert _state(spark, tdir) == {(1, 0): 100, (2, 1): 200}
