"""CDC-driven incremental view maintenance (sources/rollup.ivm_*):
signed-partial refresh under upserts/deletes, zero-group vanishing,
compaction invariance, retry idempotence, vacuum fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conversation_with_vector_db_spark.sources import transactional as tx
from conversation_with_vector_db_spark.sources.rollup import (
    ivm_read,
    ivm_refresh,
)
from conversation_with_vector_db_spark.sources.snapshot_log import (
    compact_snapshots,
    latest_version,
    vacuum,
)

SCHEMA = "vec_id: long, label: int, namespace: int"


def _mk(spark, t, rows):
    tx.create_partitioned_table(
        spark, spark.createDataFrame(rows, SCHEMA), t, key="vec_id"
    )


def _direct(spark, t):
    return {
        r["namespace"]: (r["n"], r["total"])
        for r in tx.read_table(spark, t)
        .groupBy("namespace")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("label").alias("total"),
        )
        .collect()
    }


def _view(spark, v):
    return {
        r["grp"]: (r["n_rows"], r["total"])
        for r in ivm_read(spark, v).collect()
    }


def test_ivm_converges_through_mutations(spark, tmp_path):
    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(i, i * 10, i % 3) for i in range(1, 10)])
    assert ivm_refresh(spark, src, v)["mode"] == "full"
    assert _view(spark, v) == _direct(spark, src)

    # Updates (one moves groups), an insert, a delete.
    tx.upsert_by_key_global(
        spark,
        src,
        spark.createDataFrame(
            [(1, 999, 2), (2, 5, 2), (100, 7, 0)], SCHEMA
        ),
        key="vec_id",
    )
    tx.merge_into(
        spark,
        src,
        spark.createDataFrame([(3, 0, 0)], SCHEMA),
        key="vec_id",
        matched=(("delete", None, None),),
        insert=False,
    )
    r = ivm_refresh(spark, src, v)
    assert r["mode"] == "incremental"
    assert _view(spark, v) == _direct(spark, src)

    # Third round on top of the folded partials.
    tx.upsert_by_key(
        spark,
        src,
        spark.createDataFrame([(4, -50, 1)], SCHEMA),
        key="vec_id",
    )
    assert ivm_refresh(spark, src, v)["mode"] == "incremental"
    assert _view(spark, v) == _direct(spark, src)


def test_ivm_group_vanishes_when_emptied(spark, tmp_path):
    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(1, 10, 0), (2, 20, 1)])
    ivm_refresh(spark, src, v)
    tx.merge_into(
        spark,
        src,
        spark.createDataFrame([(2, 0, 1)], SCHEMA),
        key="vec_id",
        matched=(("delete", None, None),),
        insert=False,
    )
    ivm_refresh(spark, src, v)
    got = _view(spark, v)
    assert 1 not in got and got[0] == (1, 10)


def test_ivm_refresh_is_idempotent_and_noops_at_head(spark, tmp_path):
    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(1, 10, 0)])
    ivm_refresh(spark, src, v)
    assert ivm_refresh(spark, src, v)["mode"] == "noop"
    head = latest_version(v)
    assert ivm_refresh(spark, src, v)["mode"] == "noop"
    assert latest_version(v) == head  # no empty commits pile up


def test_ivm_source_compaction_moves_watermark_only(spark, tmp_path):
    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(i, i, i % 2) for i in range(6)])
    tx.append_partitioned(
        spark,
        spark.createDataFrame([(50, 5, 0)], SCHEMA),
        src,
    )
    ivm_refresh(spark, src, v)
    before = _view(spark, v)
    compact_snapshots(spark, src)  # removal, but a PURE rewrite
    r = ivm_refresh(spark, src, v)
    assert r["mode"] == "incremental"  # no full rebuild
    assert _view(spark, v) == before == _direct(spark, src)
    # Watermark actually moved: next refresh is a noop.
    assert ivm_refresh(spark, src, v)["mode"] == "noop"


def test_ivm_view_compaction_is_read_invariant(spark, tmp_path):
    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(i, i, i % 2) for i in range(1, 7)])
    ivm_refresh(spark, src, v)
    for i in range(3):
        tx.upsert_by_key(
            spark,
            src,
            spark.createDataFrame([(1, 100 + i, 1)], SCHEMA),
            key="vec_id",
        )
        ivm_refresh(spark, src, v)
    before = _view(spark, v)
    compact_snapshots(spark, v)  # fold the partial backlog
    assert _view(spark, v) == before == _direct(spark, src)


def test_ivm_vacuumed_watermark_falls_back_to_full(spark, tmp_path):
    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(1, 10, 0), (2, 20, 1)])
    ivm_refresh(spark, src, v)
    for i in range(3, 8):
        tx.upsert_by_key(
            spark,
            src,
            spark.createDataFrame([(i, i, i % 2)], SCHEMA),
            key="vec_id",
        )
    vacuum(src, keep_versions=1, orphan_min_age_sec=0.0)
    r = ivm_refresh(spark, src, v)
    assert r["mode"] == "full"
    assert _view(spark, v) == _direct(spark, src)


@pytest.mark.heavy
def test_streaming_ivm_sink_converges_and_restarts_clean(
    spark, tmp_path
):
    """The streaming composition: readChangeFeed from table creation
    -> signed partials per micro-batch -> txn-tagged view commits.
    After each drain the view equals the direct aggregate; a
    checkpoint restart commits nothing."""
    from conversation_with_vector_db_spark.sources.datasource import (
        register,
    )
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        latest_version as lv,
    )
    from conversation_with_vector_db_spark.streaming.sessions import (
        streaming_ivm_sink,
    )

    register(spark)
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    ck = str(tmp_path / "ck")
    _mk(spark, src, [(i, i * 10, i % 3) for i in range(1, 7)])

    def start():
        stream = (
            spark.readStream.format("snapshot_log")
            .option("path", src)
            .option("readChangeFeed", "true")
            .option("startingVersion", 1)
            .load()
        )
        return streaming_ivm_sink(stream, view, ck).start()

    q = start()
    q.processAllAvailable()
    assert _view(spark, view) == _direct(spark, src)

    tx.upsert_by_key_global(
        spark,
        src,
        spark.createDataFrame([(1, 999, 2), (50, 5, 0)], SCHEMA),
        key="vec_id",
    )
    tx.merge_into(
        spark,
        src,
        spark.createDataFrame([(2, 0, 2)], SCHEMA),
        key="vec_id",
        matched=(("delete", None, None),),
        insert=False,
    )
    q.processAllAvailable()
    q.stop()
    assert _view(spark, view) == _direct(spark, src)

    head = lv(view)
    q = start()
    q.processAllAvailable()
    q.stop()
    assert lv(view) == head  # restart commits nothing
    assert _view(spark, view) == _direct(spark, src)


@pytest.mark.heavy
def test_streaming_ivm_auto_compaction_bounds_partials(
    spark, tmp_path
):
    from conversation_with_vector_db_spark.sources.datasource import (
        register,
    )
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        live_segments as live,
    )
    from conversation_with_vector_db_spark.streaming.sessions import (
        streaming_ivm_sink,
    )

    register(spark)
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    _mk(spark, src, [(i, i, i % 2) for i in range(1, 5)])
    stream = (
        spark.readStream.format("snapshot_log")
        .option("path", src)
        .option("readChangeFeed", "true")
        .option("startingVersion", 1)
        .load()
    )
    q = streaming_ivm_sink(
        stream, view, str(tmp_path / "ck"), auto_compact_every=2
    ).start()
    for i in range(5):
        tx.upsert_by_key(
            spark,
            src,
            spark.createDataFrame([(1, 100 + i, 1)], SCHEMA),
            key="vec_id",
        )
        q.processAllAvailable()
        assert _view(spark, view) == _direct(spark, src)
    q.stop()
    assert len(live(view)) <= 3  # folds bound the partial backlog


def test_ivm_converges_through_source_restore(spark, tmp_path):
    """RESTORE is just another mutation commit to the feed: the view
    follows the un-restore of an upsert incrementally."""
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        restore_table,
    )

    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(1, 10, 0), (2, 20, 1)])
    v_good = latest_version(src)
    ivm_refresh(spark, src, v)
    tx.upsert_by_key(
        spark,
        src,
        spark.createDataFrame([(1, 999, 0), (3, 7, 1)], SCHEMA),
        key="vec_id",
    )
    ivm_refresh(spark, src, v)
    assert _view(spark, v) == _direct(spark, src)
    restore_table(src, v_good)
    r = ivm_refresh(spark, src, v)
    assert r["mode"] == "incremental"
    assert _view(spark, v) == _direct(spark, src) == {
        0: (1, 10), 1: (1, 20),
    }


@pytest.mark.heavy
def test_ivm_randomized_walk_matches_direct_aggregate(
    spark, tmp_path
):
    """Model test: a seeded random sequence of upserts / global
    upserts / deletes / appends / compactions with refreshes at
    random points — after every refresh the view equals the direct
    aggregate."""
    import random

    rng = random.Random(20260815)
    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(i, i, i % 3) for i in range(1, 13)])
    ivm_refresh(spark, src, v)
    next_id = 100
    for step in range(12):
        op = rng.choice(["upsert", "global", "delete", "append",
                         "compact"])
        if op == "upsert":
            k = rng.randrange(1, 13)
            tx.upsert_by_key(
                spark,
                src,
                spark.createDataFrame(
                    [(k, rng.randrange(-50, 50), k % 3)], SCHEMA
                ),
                key="vec_id",
            )
        elif op == "global":
            k = rng.randrange(1, 13)
            tx.upsert_by_key_global(
                spark,
                src,
                spark.createDataFrame(
                    [(k, rng.randrange(-50, 50),
                      rng.randrange(3))], SCHEMA
                ),
                key="vec_id",
            )
        elif op == "delete":
            state = {
                r["vec_id"]: r["namespace"]
                for r in tx.read_table(spark, src).collect()
            }
            if state:
                k = rng.choice(sorted(state))
                tx.merge_into(
                    spark,
                    src,
                    spark.createDataFrame(
                        [(k, 0, state[k])], SCHEMA
                    ),
                    key="vec_id",
                    matched=(("delete", None, None),),
                    insert=False,
                )
        elif op == "append":
            tx.append_partitioned(
                spark,
                spark.createDataFrame(
                    [(next_id, rng.randrange(100), next_id % 3)],
                    SCHEMA,
                ),
                src,
            )
            next_id += 1
        else:
            compact_snapshots(spark, src)
        if rng.random() < 0.6 or step == 11:
            ivm_refresh(spark, src, v)
            assert _view(spark, v) == _direct(spark, src), (
                f"diverged at step {step} after {op}"
            )


def _mview(spark, v):
    from conversation_with_vector_db_spark.sources.rollup import (
        ivm_read_minmax,
    )

    return {
        r["grp"]: (r["n_rows"], r["total"], r["vmin"], r["vmax"])
        for r in ivm_read_minmax(spark, v).collect()
    }


def _mdirect(spark, t):
    return {
        r["namespace"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in tx.read_table(spark, t)
        .groupBy("namespace")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("label").alias("total"),
            F.min("label").alias("vmin"),
            F.max("label").alias("vmax"),
        )
        .collect()
    }


def test_ivm_minmax_inserts_extend_without_rescan(spark, tmp_path):
    from conversation_with_vector_db_spark.sources.rollup import (
        ivm_refresh_minmax,
    )

    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(1, 10, 0), (2, 20, 0), (3, 5, 1)])
    assert ivm_refresh_minmax(spark, src, v)["mode"] == "full"
    assert _mview(spark, v) == _mdirect(spark, src)
    tx.append_partitioned(
        spark,
        spark.createDataFrame([(9, 99, 0), (10, 1, 0)], SCHEMA),
        src,
    )
    r = ivm_refresh_minmax(spark, src, v)
    assert r["mode"] == "incremental"
    assert r["rescanned_groups"] == []  # inserts only extend
    assert _mview(spark, v) == _mdirect(spark, src)
    assert _mview(spark, v)[0][2:] == (1, 99)


def test_ivm_minmax_interior_delete_no_rescan(spark, tmp_path):
    from conversation_with_vector_db_spark.sources.rollup import (
        ivm_refresh_minmax,
    )

    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(1, 10, 0), (2, 20, 0), (3, 30, 0)])
    ivm_refresh_minmax(spark, src, v)
    tx.merge_into(
        spark,
        src,
        spark.createDataFrame([(2, 0, 0)], SCHEMA),  # interior value
        key="vec_id",
        matched=(("delete", None, None),),
        insert=False,
    )
    r = ivm_refresh_minmax(spark, src, v)
    assert r["rescanned_groups"] == []  # 20 is strictly inside 10..30
    assert _mview(spark, v) == _mdirect(spark, src)


def test_ivm_minmax_extremum_delete_rescans_that_group_only(
    spark, tmp_path
):
    from conversation_with_vector_db_spark.sources.rollup import (
        ivm_refresh_minmax,
    )

    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(
        spark,
        src,
        [(1, 10, 0), (2, 20, 0), (3, 30, 0), (4, 7, 1), (5, 9, 1)],
    )
    ivm_refresh_minmax(spark, src, v)
    tx.merge_into(
        spark,
        src,
        spark.createDataFrame([(3, 0, 0)], SCHEMA),  # group 0's MAX
        key="vec_id",
        matched=(("delete", None, None),),
        insert=False,
    )
    r = ivm_refresh_minmax(spark, src, v)
    assert r["rescanned_groups"] == [0]  # group 1 untouched
    got = _mview(spark, v)
    assert got == _mdirect(spark, src)
    assert got[0][2:] == (10, 20)


def test_ivm_minmax_group_emptied_and_update_moves_extremum(
    spark, tmp_path
):
    from conversation_with_vector_db_spark.sources.rollup import (
        ivm_refresh_minmax,
    )

    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(1, 10, 0), (2, 20, 1)])
    ivm_refresh_minmax(spark, src, v)
    # Update group 1's only row downward (preimage 20 was both
    # extrema -> rescan), and empty group 0.
    tx.upsert_by_key(
        spark,
        src,
        spark.createDataFrame([(2, 3, 1)], SCHEMA),
        key="vec_id",
    )
    tx.merge_into(
        spark,
        src,
        spark.createDataFrame([(1, 0, 0)], SCHEMA),
        key="vec_id",
        matched=(("delete", None, None),),
        insert=False,
    )
    r = ivm_refresh_minmax(spark, src, v)
    got = _mview(spark, v)
    assert got == _mdirect(spark, src) == {1: (1, 3, 3, 3)}
    assert 0 not in got
    assert ivm_refresh_minmax(spark, src, v)["mode"] == "noop"


@pytest.mark.heavy
def test_ivm_minmax_randomized_walk(spark, tmp_path):
    import random

    from conversation_with_vector_db_spark.sources.rollup import (
        ivm_refresh_minmax,
    )

    rng = random.Random(8151945)
    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    _mk(spark, src, [(i, i * 3, i % 3) for i in range(1, 10)])
    ivm_refresh_minmax(spark, src, v)
    next_id = 50
    for step in range(10):
        op = rng.choice(["upsert", "delete", "append", "compact"])
        if op == "upsert":
            k = rng.randrange(1, 10)
            tx.upsert_by_key(
                spark,
                src,
                spark.createDataFrame(
                    [(k, rng.randrange(-40, 40), k % 3)], SCHEMA
                ),
                key="vec_id",
            )
        elif op == "delete":
            state = {
                r["vec_id"]: r["namespace"]
                for r in tx.read_table(spark, src).collect()
            }
            if state:
                k = rng.choice(sorted(state))
                tx.merge_into(
                    spark,
                    src,
                    spark.createDataFrame([(k, 0, state[k])], SCHEMA),
                    key="vec_id",
                    matched=(("delete", None, None),),
                    insert=False,
                )
        elif op == "append":
            tx.append_partitioned(
                spark,
                spark.createDataFrame(
                    [(next_id, rng.randrange(-40, 40), next_id % 3)],
                    SCHEMA,
                ),
                src,
            )
            next_id += 1
        else:
            compact_snapshots(spark, src)
        if rng.random() < 0.7 or step == 9:
            ivm_refresh_minmax(spark, src, v)
            assert _mview(spark, v) == _mdirect(spark, src), (
                f"diverged at step {step} after {op}"
            )


def test_ivm_minmax_group_other_than_partition(spark, tmp_path):
    """When the GROUP column is not the partition tag, the extremum
    rescan must fall back to a row-filtered full read — segment-list
    pruning by group values would silently miss rows."""
    from conversation_with_vector_db_spark.sources.rollup import (
        ivm_refresh_minmax,
    )

    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    # label%2 is the group; namespace is the partition — disjoint.
    rows = [(i, i * 7 % 40, i % 3) for i in range(1, 12)]
    _mk(spark, src, rows)
    ivm_refresh_minmax(
        spark, src, v, group_col="label", value_col="vec_id"
    )
    # Delete the row holding group-X's max vec_id.
    state = tx.read_table(spark, src).collect()
    target = max(state, key=lambda r: r["vec_id"])
    tx.merge_into(
        spark,
        src,
        spark.createDataFrame(
            [(target["vec_id"], 0, target["namespace"])], SCHEMA
        ),
        key="vec_id",
        matched=(("delete", None, None),),
        insert=False,
    )
    ivm_refresh_minmax(
        spark, src, v, group_col="label", value_col="vec_id"
    )
    got = {
        r["grp"]: (r["n_rows"], r["total"], r["vmin"], r["vmax"])
        for r in __import__(
            "conversation_with_vector_db_spark.sources.rollup",
            fromlist=["ivm_read_minmax"],
        ).ivm_read_minmax(spark, v).collect()
    }
    want = {
        r["label"]: (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in tx.read_table(spark, src)
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("vec_id").alias("total"),
            F.min("vec_id").alias("vmin"),
            F.max("vec_id").alias("vmax"),
        )
        .collect()
    }
    assert got == want


def test_ivm_minmax_null_group_rescan(spark, tmp_path):
    """A NULL group is a real group: deleting its extremum must
    rescan and refill it (isin alone would drop NULL-group rows)."""
    from conversation_with_vector_db_spark.sources.rollup import (
        ivm_refresh_minmax,
    )

    src = str(tmp_path / "src")
    v = str(tmp_path / "view")
    df = spark.createDataFrame(
        [(1, 10, 0, None), (2, 20, 0, None), (3, 5, 1, "a")],
        "vec_id: long, label: int, namespace: int, region: string",
    )
    tx.create_partitioned_table(spark, df, src, key="vec_id")
    ivm_refresh_minmax(spark, src, v, group_col="region")
    tx.merge_into(
        spark,
        src,
        spark.createDataFrame(
            [(2, 0, 0, None)],
            "vec_id: long, label: int, namespace: int, region: string",
        ),
        key="vec_id",
        matched=(("delete", None, None),),  # NULL group's max (20)
        insert=False,
    )
    r = ivm_refresh_minmax(spark, src, v, group_col="region")
    assert r["rescanned_groups"] == [None]
    got = {
        rr["grp"]: (rr["n_rows"], rr["vmin"], rr["vmax"])
        for rr in __import__(
            "conversation_with_vector_db_spark.sources.rollup",
            fromlist=["ivm_read_minmax"],
        ).ivm_read_minmax(spark, v).collect()
    }
    assert got[None] == (1, 10, 10) and got["a"] == (1, 5, 5)
