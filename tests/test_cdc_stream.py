"""The readChangeFeed stream (sources/datasource.py): full CDC rows
(insert/delete/update pre+postimage) per commit window — pinned equal
to the batch table_changes range read, invariant-op skipping, restart
exactly-once, and the streaming replication loop it exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from conversation_with_vector_db_spark.sources import transactional as tx
from conversation_with_vector_db_spark.sources.datasource import register
from conversation_with_vector_db_spark.sources.snapshot_log import (
    compact_snapshots,
    latest_version,
)


@pytest.fixture()
def ds_spark(spark):
    register(spark)
    return spark


SCHEMA = "vec_id: long, label: int, namespace: int"


def _mk(spark, t, rows):
    tx.create_partitioned_table(
        spark, spark.createDataFrame(rows, SCHEMA), t, key="vec_id"
    )


def _state(spark, t):
    return {
        (r["vec_id"], r["namespace"]): r["label"]
        for r in tx.read_table(spark, t).collect()
    }


def _cdc_rows(df):
    return sorted(
        (
            r["_change_type"],
            r["vec_id"],
            r["label"],
            r["namespace"],
            r["_commit_version"],
        )
        for r in df.collect()
    )


def test_cdc_stream_matches_batch_table_changes(ds_spark, tmp_path):
    t = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(ds_spark, t, [(1, 2, 0), (2, 3, 1), (3, 4, 2)])
    v0 = latest_version(t)
    # Mutations: update a row, insert a row, delete a row.
    tx.upsert_by_key(
        ds_spark,
        t,
        ds_spark.createDataFrame([(1, 100, 0), (9, 7, 1)], SCHEMA),
        key="vec_id",
    )
    tx.merge_into(
        ds_spark,
        t,
        ds_spark.createDataFrame([(2, 0, 1)], SCHEMA),
        key="vec_id",
        matched=(("delete", None, None),),
        insert=False,
    )
    head = latest_version(t)

    got: list = []

    def sink(df, _bid):
        got.extend(df.collect())

    q = (
        ds_spark.readStream.format("snapshot_log")
        .option("path", t)
        .option("readChangeFeed", "true")
        .option("startingVersion", v0 + 1)
        .option("key", "vec_id")
        .option("partitionCol", "namespace")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    stream_rows = sorted(
        (
            r["_change_type"], r["vec_id"], r["label"], r["namespace"]
        )
        for r in got
    )
    batch_rows = sorted(
        (
            r["_change_type"], r["vec_id"], r["label"], r["namespace"]
        )
        for r in tx.table_changes(
            ds_spark, t, v0, head, key="vec_id"
        ).collect()
    )
    assert stream_rows == batch_rows
    assert ("update_preimage", 1, 2, 0) in stream_rows
    assert ("update_postimage", 1, 100, 0) in stream_rows
    assert ("insert", 9, 7, 1) in stream_rows
    assert ("delete", 2, 3, 1) in stream_rows
    # Every row carries the version of the commit that produced it,
    # and all versions sit inside the mutation window.
    assert all(
        v0 < r["_commit_version"] <= head for r in got
    )

    # Restart on the same checkpoint: nothing re-delivered.
    got.clear()
    q = (
        ds_spark.readStream.format("snapshot_log")
        .option("path", t)
        .option("readChangeFeed", "true")
        .option("startingVersion", v0 + 1)
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert got == []


def test_cdc_stream_skips_data_invariant_maintenance(
    ds_spark, tmp_path
):
    t = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(ds_spark, t, [(i, i, i % 2) for i in range(8)])
    tx.append_partitioned(
        ds_spark,
        ds_spark.createDataFrame([(100, 1, 0)], SCHEMA),
        t,
    )
    v0 = latest_version(t)
    compact_snapshots(ds_spark, t)  # pure re-packaging
    tx.zorder_rewrite(ds_spark, t, by=("vec_id",), key="vec_id")
    assert latest_version(t) > v0

    got: list = []
    q = (
        ds_spark.readStream.format("snapshot_log")
        .option("path", t)
        .option("readChangeFeed", "true")
        .option("startingVersion", v0 + 1)
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _b: got.extend(df.collect()))
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert got == []


@pytest.mark.heavy
def test_cdc_streaming_replication_converges(ds_spark, tmp_path):
    """The loop the feed exists for: a replica follows the source
    purely through the CDC stream — per batch, collapse to the LAST
    change per key (by _commit_version), then one merge applies
    deletes and upserts. After each drain the replica equals the
    source, including a delete-then-reinsert landing in one batch."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    _mk(ds_spark, src, [(1, 2, 0), (2, 3, 1), (3, 4, 2)])
    tx.create_partitioned_table(
        ds_spark, tx.read_table(ds_spark, src), dst, key="vec_id"
    )
    v0 = latest_version(src)

    def apply_batch(df, _bid):
        last = (
            df.where(F.col("_change_type") != "update_preimage")
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("namespace", "vec_id").orderBy(
                        F.col("_commit_version").desc()
                    )
                ),
            )
            .where(F.col("_rn") == 1)
            .drop("_rn", "_commit_version")
        )
        dels = last.where(
            F.col("_change_type") == "delete"
        ).drop("_change_type")
        ups = last.where(
            F.col("_change_type") != "delete"
        ).drop("_change_type")
        if dels.limit(1).count():
            tx.merge_into(
                ds_spark,
                dst,
                dels,
                key="vec_id",
                matched=(("delete", None, None),),
                insert=False,
            )
        if ups.limit(1).count():
            tx.merge_into(ds_spark, dst, ups, key="vec_id")

    q = (
        ds_spark.readStream.format("snapshot_log")
        .option("path", src)
        .option("readChangeFeed", "true")
        .option("startingVersion", v0 + 1)
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", ck)
        .start()
    )

    # Round 1: update + insert.
    tx.upsert_by_key(
        ds_spark,
        src,
        ds_spark.createDataFrame([(1, 100, 0), (9, 7, 1)], SCHEMA),
        key="vec_id",
    )
    q.processAllAvailable()
    assert _state(ds_spark, src) == _state(ds_spark, dst)

    # Round 2 (one drain, three commits): delete key 2, re-insert it
    # with a new label, update key 3 — the last-change collapse must
    # net out to the final state.
    tx.merge_into(
        ds_spark,
        src,
        ds_spark.createDataFrame([(2, 0, 1)], SCHEMA),
        key="vec_id",
        matched=(("delete", None, None),),
        insert=False,
    )
    tx.upsert_by_key(
        ds_spark,
        src,
        ds_spark.createDataFrame([(2, 55, 1)], SCHEMA),
        key="vec_id",
    )
    tx.upsert_by_key(
        ds_spark,
        src,
        ds_spark.createDataFrame([(3, 77, 2)], SCHEMA),
        key="vec_id",
    )
    q.processAllAvailable()
    q.stop()
    assert _state(ds_spark, src) == _state(ds_spark, dst)
    assert _state(ds_spark, dst)[(2, 1)] == 55


def test_cdc_stream_covers_restore_and_stamps_timestamps(
    ds_spark, tmp_path
):
    """A RESTORE is a mutation commit: the feed derives its diff like
    any other (the un-restore of an upsert reads as the inverse
    changes), and every row carries the commit's in-commit
    timestamp."""
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        commit_timestamp,
        restore_table,
    )

    t = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(ds_spark, t, [(1, 2, 0), (2, 3, 1)])
    v0 = latest_version(t)
    tx.upsert_by_key(
        ds_spark,
        t,
        ds_spark.createDataFrame([(1, 100, 0)], SCHEMA),
        key="vec_id",
    )
    restore_table(t, v0)  # back out the upsert
    vr = latest_version(t)

    got: list = []
    q = (
        ds_spark.readStream.format("snapshot_log")
        .option("path", t)
        .option("readChangeFeed", "true")
        .option("startingVersion", v0 + 1)
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _b: got.extend(df.collect()))
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    by_ver = {}
    for r in got:
        by_ver.setdefault(r["_commit_version"], []).append(
            (r["_change_type"], r["vec_id"], r["label"])
        )
    assert sorted(by_ver[v0 + 1]) == [
        ("update_postimage", 1, 100),
        ("update_preimage", 1, 2),
    ]
    assert sorted(by_ver[vr]) == [
        ("update_postimage", 1, 2),
        ("update_preimage", 1, 100),
    ]
    for r in got:
        assert (
            abs(
                r["_commit_timestamp"]
                - commit_timestamp(t, r["_commit_version"])
            )
            < 1e-6
        )


def test_cdc_batch_range_read_through_format(ds_spark, tmp_path):
    """spark.read.format("snapshot_log").option("readChangeFeed") —
    the batch CDF range read, equal to the native table_changes over
    the same window and respecting endingVersion."""
    t = str(tmp_path / "t")
    _mk(ds_spark, t, [(1, 2, 0), (2, 3, 1)])
    v0 = latest_version(t)
    tx.upsert_by_key(
        ds_spark,
        t,
        ds_spark.createDataFrame([(1, 100, 0)], SCHEMA),
        key="vec_id",
    )
    v1 = latest_version(t)
    tx.upsert_by_key(
        ds_spark,
        t,
        ds_spark.createDataFrame([(2, 200, 1)], SCHEMA),
        key="vec_id",
    )
    head = latest_version(t)

    def fmt_read(v_from, v_to):
        return (
            ds_spark.read.format("snapshot_log")
            .option("path", t)
            .option("readChangeFeed", "true")
            .option("startingVersion", v_from)
            .option("endingVersion", v_to)
            .load()
        )

    got = sorted(
        (r["_change_type"], r["vec_id"], r["label"])
        for r in fmt_read(v0 + 1, head).collect()
    )
    want = sorted(
        (r["_change_type"], r["vec_id"], r["label"])
        for r in tx.table_changes(
            ds_spark, t, v0, head, key="vec_id"
        ).collect()
    )
    assert got == want and len(got) == 4
    # endingVersion bounds the window.
    only_first = fmt_read(v0 + 1, v1).collect()
    assert sorted(
        (r["_change_type"], r["vec_id"]) for r in only_first
    ) == [("update_postimage", 1), ("update_preimage", 1)]
    assert all(r["_commit_version"] == v1 for r in only_first)


def test_cdc_stream_behind_vacuum_fails_loudly(ds_spark, tmp_path):
    """A CDC stream that falls behind the vacuum retention window
    must FAIL (preimage manifests/files are gone), never silently
    skip changes."""
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        vacuum,
    )

    t = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(ds_spark, t, [(1, 2, 0)])
    tx.upsert_by_key(
        ds_spark,
        t,
        ds_spark.createDataFrame([(1, 10, 0)], SCHEMA),
        key="vec_id",
    )
    tx.upsert_by_key(
        ds_spark,
        t,
        ds_spark.createDataFrame([(1, 20, 0)], SCHEMA),
        key="vec_id",
    )
    vacuum(t, keep_versions=1, orphan_min_age_sec=0.0)
    q = (
        ds_spark.readStream.format("snapshot_log")
        .option("path", t)
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, b: df.collect())
        .option("checkpointLocation", ck)
        .start()
    )
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()


def test_cdc_stream_surfaces_mor_fold_changes(ds_spark, tmp_path):
    """Mutations applied through the merge-on-read overlay surface in
    the feed when compact_change_log FOLDS them into base segments —
    the fold's diff IS the overlay's changes, equal to the batch
    range read (overlay segments themselves stay invisible, matching
    table_changes' base-rows-only contract)."""
    from conversation_with_vector_db_spark.sources.transactional import (
        append_change_segment,
        compact_change_log,
    )

    t = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    _mk(ds_spark, t, [(1, 2, 0), (2, 3, 0), (3, 4, 1)])
    v0 = latest_version(t)
    append_change_segment(
        ds_spark,
        ds_spark.createDataFrame([(1, 100, 0)], SCHEMA),
        t,
        op="upsert",
        seq=1,
    )
    append_change_segment(
        ds_spark,
        ds_spark.createDataFrame([(2, 0, 0)], SCHEMA),
        t,
        op="delete",
        seq=2,
    )
    compact_change_log(ds_spark, t, key="vec_id")
    head = latest_version(t)

    got: list = []
    q = (
        ds_spark.readStream.format("snapshot_log")
        .option("path", t)
        .option("readChangeFeed", "true")
        .option("startingVersion", v0 + 1)
        .load()
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _b: got.extend(df.collect()))
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream_rows = sorted(
        (r["_change_type"], r["vec_id"], r["label"]) for r in got
    )
    batch_rows = sorted(
        (r["_change_type"], r["vec_id"], r["label"])
        for r in tx.table_changes(
            ds_spark, t, v0, head, key="vec_id"
        ).collect()
    )
    assert stream_rows == batch_rows
    assert ("update_postimage", 1, 100) in stream_rows
    assert ("delete", 2, 3) in stream_rows
    # The overlay-append commits themselves emitted nothing; only
    # the fold's versions appear.
    assert all(r["_commit_version"] == head for r in got)
