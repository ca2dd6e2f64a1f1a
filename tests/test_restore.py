"""RESTORE TABLE ... TO VERSION AS OF (snapshot_log.restore_table):
data/stats/meta rollback as one forward commit, undo-ability,
vacuumed-target refusal, constraint-map reversion."""

from __future__ import annotations

import pytest

from conversation_with_vector_db_spark.sources import transactional as tx
from conversation_with_vector_db_spark.sources.snapshot_log import (
    append_snapshot,
    create_table,
    latest_version,
    live_segments,
    read_snapshot,
    restore_table,
    rewrite_snapshot,
    segment_path,
    segment_stats,
    table_history,
    table_meta,
    vacuum,
)


def _ids(df) -> list[int]:
    return sorted(r["id"] for r in df.collect())


def _clobber(df, t):
    """Rewrite the whole table to ``df`` (remove = current live set)."""
    return rewrite_snapshot(df, t, remove=live_segments(t))


def test_restore_rolls_back_data_and_moves_history_forward(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 10), t)
    v_good = append_snapshot(spark.range(10, 15), t)  # v2
    _clobber(spark.range(100, 103), t)  # v3: clobber
    append_snapshot(spark.range(200, 205), t)  # v4
    v = restore_table(t, v_good)
    assert v == latest_version(t) == 5  # forward, never erased
    assert _ids(read_snapshot(spark, t)) == list(range(15))
    # The restored-away versions stay time-travelable.
    assert _ids(read_snapshot(spark, t, version=4)) == [
        100, 101, 102, 200, 201, 202, 203, 204,
    ]
    hist = {
        r["version"]: r["op"]
        for r in table_history(spark, t).collect()
    }
    assert hist[5] == "restore"
    # Live set is EXACTLY v2's (same relative segment paths).
    assert sorted(live_segments(t)) == sorted(live_segments(t, v_good))


def test_restore_is_undoable_by_restoring_forward(spark, tmp_path):
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 5), t)  # v1
    _clobber(spark.range(50, 53), t)  # v2
    restore_table(t, 1)  # v3: back to 0..4
    restore_table(t, 2)  # v4: undo the restore
    assert _ids(read_snapshot(spark, t)) == [50, 51, 52]


def test_restore_to_head_is_a_noop_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 5), t)
    before = sorted(live_segments(t))
    restore_table(t, latest_version(t))
    assert sorted(live_segments(t)) == before
    assert _ids(read_snapshot(spark, t)) == list(range(5))


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    # Normal vacuum reaps the old MANIFEST too: the failure surfaces
    # at version resolution, before anything is committed.
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 5), t)  # v1
    _clobber(spark.range(9, 12), t)  # v2: v1 segs now dead
    vacuum(t, keep_versions=1, orphan_min_age_sec=0.0)
    with pytest.raises(FileNotFoundError):
        restore_table(t, 1)
    assert _ids(read_snapshot(spark, t)) == [9, 10, 11]


def test_restore_refuses_missing_data_files(spark, tmp_path):
    # Manifest retained but a target data file gone (external
    # deletion / partial reclamation): fail-closed BEFORE committing
    # — restore must never publish a head referencing missing data.
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 5), t)  # v1
    gone = live_segments(t, 1)[0]
    _clobber(spark.range(9, 12), t)  # v2
    import shutil

    shutil.rmtree(segment_path(t, gone))
    with pytest.raises(ValueError, match="vacuumed"):
        restore_table(t, 1)
    assert _ids(read_snapshot(spark, t)) == [9, 10, 11]


def test_restore_reverts_meta_and_constraints(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 5, 0), (2, 6, 1)],
        "vec_id: long, label: int, namespace: int",
    )
    tx.create_partitioned_table(spark, df, t)
    v_free = latest_version(t)
    tx.add_check_constraint(spark, t, "nonneg", "label >= 0")
    assert tx.table_constraints(t) == {"nonneg": "label >= 0"}
    restore_table(t, v_free)
    # The constraint map reverted with the data: key cleared (None
    # reads as absent through .get) and writes it blocked now land.
    assert tx.table_constraints(t) == {}
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(3, -7, 0)], "vec_id: long, label: int, namespace: int"
        ),
        t,
    )
    rows = {
        (r["vec_id"], r["label"])
        for r in tx.read_table(spark, t).collect()
    }
    assert (3, -7) in rows


def test_restore_reinstates_segment_stats(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i * 10, i % 2) for i in range(1, 9)],
        "vec_id: long, label: int, namespace: int",
    )
    tx.create_partitioned_table(spark, df, t, key="vec_id")
    v_stats = latest_version(t)
    had = segment_stats(t, v_stats)
    assert had  # keyed create records min/max per segment
    # Clobber the whole table, then restore: the re-added segments
    # must carry their original stats so keyed pruning keeps working.
    _clobber(spark.range(0, 3), t)
    assert segment_stats(t) == {}
    restore_table(t, v_stats)
    assert segment_stats(t) == had
    assert table_meta(t).get("constraints") is None
    # Stats actually drive pruning: a keyed upsert touching one key
    # must not rewrite segments whose range excludes it.
    tx.upsert_by_key(
        spark,
        t,
        spark.createDataFrame(
            [(1, 999, 1)], "vec_id: long, label: int, namespace: int"
        ),
        key="vec_id",
    )
    got = {
        (r["vec_id"], r["label"])
        for r in tx.read_table(spark, t).collect()
    }
    assert (1, 999) in got and (2, 20) in got


def test_restore_survives_vacuum_when_target_in_window(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 5), t)  # v1
    append_snapshot(spark.range(5, 8), t)  # v2
    restore_table(t, 1)  # v3
    # v1's segments are live at head again: vacuum must keep them.
    vacuum(t, keep_versions=1, orphan_min_age_sec=0.0)
    assert _ids(read_snapshot(spark, t)) == list(range(5))


def test_restore_racing_append_keeps_the_append(spark, tmp_path):
    """The documented restore-vs-append resolution: an append that
    lands between the restore's read and its CAS survives (its
    segment is in neither version's live set), same as Delta."""
    import threading

    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 5), t)  # v1
    _clobber(spark.range(50, 53), t)  # v2

    # Race: many appends while a restore commits.
    errs: list = []

    def appender():
        try:
            append_snapshot(spark.range(100, 103), t)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    th = threading.Thread(target=appender)
    th.start()
    restore_table(t, 1)
    th.join()
    assert not errs
    got = set(_ids(read_snapshot(spark, t)))
    # Restore target rows are back; the racing append either landed
    # before the restore's read (then it was part of "current" and
    # was removed) or after (then it survives) — both serializable.
    assert set(range(5)) <= got
    assert not ({50, 51, 52} & got)
    assert got - set(range(5)) in (set(), {100, 101, 102})
