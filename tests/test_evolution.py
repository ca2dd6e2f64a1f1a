"""Schema evolution (sources/evolution.py): widen-without-rewrite,
typed-NULL backfill, time-travel shape, fail-closed type changes,
and compaction compatibility."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest

from conversation_with_vector_db_spark.sources import evolution as ev
from conversation_with_vector_db_spark.sources.snapshot_log import (
    compact_snapshots,
    latest_version,
    live_segments,
)


@pytest.fixture()
def tdir():
    yield os.path.join(
        tempfile.gettempdir(), "cvdb_evo_test", uuid.uuid4().hex
    )


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def test_add_column_without_rewrite(spark, tdir):
    ev.create_evolved_table(
        spark.createDataFrame([(1, "a")], "id: long, txt: string"),
        tdir,
    )
    before = set(live_segments(tdir, latest_version(tdir)))
    ev.append_evolved(
        spark.createDataFrame(
            [(2, "b", 0.5)], "id: long, txt: string, score: double"
        ),
        tdir,
    )
    after = set(live_segments(tdir, latest_version(tdir)))
    # Old segment untouched; evolution rewrote nothing.
    assert before <= after
    got = ev.read_evolved(spark, tdir)
    assert got.columns == ["id", "txt", "score"]
    assert _rows(got) == [(1, "a", None), (2, "b", 0.5)]


def test_time_travel_shows_old_shape(spark, tdir):
    v1 = ev.create_evolved_table(
        spark.createDataFrame([(1, "a")], "id: long, txt: string"),
        tdir,
    )
    ev.append_evolved(
        spark.createDataFrame(
            [(2, "b", 0.5)], "id: long, txt: string, score: double"
        ),
        tdir,
    )
    old = ev.read_evolved(spark, tdir, version=v1)
    assert old.columns == ["id", "txt"]
    assert _rows(old) == [(1, "a")]


def test_omitted_columns_read_as_null(spark, tdir):
    ev.create_evolved_table(
        spark.createDataFrame(
            [(1, "a", 0.1)], "id: long, txt: string, score: double"
        ),
        tdir,
    )
    ev.append_evolved(
        spark.createDataFrame([(2,)], "id: long"), tdir
    )
    assert _rows(ev.read_evolved(spark, tdir)) == [
        (1, "a", 0.1),
        (2, None, None),
    ]


def test_type_change_fails_closed(spark, tdir):
    ev.create_evolved_table(
        spark.createDataFrame([(1, "a")], "id: long, txt: string"),
        tdir,
    )
    with pytest.raises(ev.SchemaEvolutionError, match="type changes"):
        ev.append_evolved(
            spark.createDataFrame([(2, 3)], "id: long, txt: long"),
            tdir,
        )
    # Failed evolution must not have committed anything.
    assert ev.read_evolved(spark, tdir).columns == ["id", "txt"]


def test_untracked_table_rejected(spark, tdir):
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        append_snapshot,
        create_table,
    )

    create_table(tdir)
    append_snapshot(
        spark.createDataFrame([(1,)], "id: long"), tdir
    )
    with pytest.raises(ev.SchemaEvolutionError, match="schema-tracked"):
        ev.append_evolved(
            spark.createDataFrame([(2,)], "id: long"), tdir
        )
    with pytest.raises(ev.SchemaEvolutionError, match="schema-tracked"):
        ev.read_evolved(spark, tdir)


def test_compaction_preserves_evolved_reads(spark, tdir):
    ev.create_evolved_table(
        spark.createDataFrame([(1, "a")], "id: long, txt: string"),
        tdir,
    )
    for i in range(2, 6):
        ev.append_evolved(
            spark.createDataFrame(
                [(i, f"t{i}", float(i))],
                "id: long, txt: string, score: double",
            ),
            tdir,
        )
    want = _rows(ev.read_evolved(spark, tdir))
    n_before = len(live_segments(tdir, latest_version(tdir)))
    compact_snapshots(spark, tdir, target_bytes=1 << 30)
    n_after = len(live_segments(tdir, latest_version(tdir)))
    assert n_after < n_before
    assert _rows(ev.read_evolved(spark, tdir)) == want


def test_evolution_is_append_only_of_columns(spark, tdir):
    # New columns append to the recorded order regardless of the
    # writer's column order.
    ev.create_evolved_table(
        spark.createDataFrame([(1, "a")], "id: long, txt: string"),
        tdir,
    )
    ev.append_evolved(
        spark.createDataFrame(
            [(9.9, 2, "z")], "score: double, id: long, txt: string"
        ),
        tdir,
    )
    assert ev.read_evolved(spark, tdir).columns == [
        "id",
        "txt",
        "score",
    ]
