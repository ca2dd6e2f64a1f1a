"""Continuous aggregate (sources/rollup.py): incremental refresh
reads only new segments, removals force the full-rebuild fallback,
refresh is idempotent, and compacting the rollup table is invisible
to reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from conversation_with_vector_db_spark.sources.rollup import (
    rollup_read,
    rollup_refresh,
)
from conversation_with_vector_db_spark.sources.snapshot_log import (
    append_snapshot,
    compact_snapshots,
    create_table,
    latest_version,
    table_meta,
)


def _events(spark, lo, n, key_offset=0):
    return spark.range(lo, lo + n).select(
        (F.col("id") + key_offset).alias("event_id"),
        F.timestamp_seconds(F.col("id") * 600).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
    )


def _merged(spark, rup):
    return {
        r["bucket"]: (r["n_events"], round(r["total"], 6),
                      r["vmin"], r["vmax"])
        for r in rollup_read(spark, rup).collect()
    }


def _direct(spark, dfs):
    u = dfs[0]
    for d in dfs[1:]:
        u = u.unionByName(d)
    got = (
        u.select(
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp"))
                / F.lit(3_600_000_000).cast("long")
            ).alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("t"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    )
    return {
        r["bucket"]: (r["n"], round(r["t"], 6), r["lo"], r["hi"])
        for r in got
    }


def test_incremental_reads_only_new_segments(spark, tmp_path):
    src, rup = str(tmp_path / "src"), str(tmp_path / "rup")
    create_table(src)
    s1, s2 = _events(spark, 0, 200), _events(spark, 200, 150)
    append_snapshot(s1, src)
    r1 = rollup_refresh(spark, src, rup)
    assert r1["mode"] == "full"
    append_snapshot(s2, src)
    r2 = rollup_refresh(spark, src, rup)
    assert r2["mode"] == "incremental"
    assert r2["segments_read"] == 1
    assert _merged(spark, rup) == _direct(spark, [s1, s2])
    assert table_meta(rup)["rollup_source_version"] == latest_version(src)


def test_refresh_is_idempotent_at_head(spark, tmp_path):
    src, rup = str(tmp_path / "src"), str(tmp_path / "rup")
    create_table(src)
    append_snapshot(_events(spark, 0, 50), src)
    rollup_refresh(spark, src, rup)
    before = _merged(spark, rup)
    v = latest_version(rup)
    assert rollup_refresh(spark, src, rup)["mode"] == "noop"
    assert latest_version(rup) == v
    assert _merged(spark, rup) == before


def test_source_compaction_forces_full_rebuild(spark, tmp_path):
    src, rup = str(tmp_path / "src"), str(tmp_path / "rup")
    create_table(src)
    s1, s2 = _events(spark, 0, 80), _events(spark, 80, 80)
    append_snapshot(s1, src)
    append_snapshot(s2, src)
    rollup_refresh(spark, src, rup)
    compact_snapshots(spark, src)
    r = rollup_refresh(spark, src, rup)
    assert r["mode"] == "full"
    assert _merged(spark, rup) == _direct(spark, [s1, s2])


def test_rollup_compaction_is_invisible_to_reads(spark, tmp_path):
    src, rup = str(tmp_path / "src"), str(tmp_path / "rup")
    create_table(src)
    slices = [_events(spark, i * 60, 60) for i in range(4)]
    append_snapshot(slices[0], src)
    rollup_refresh(spark, src, rup)
    for s in slices[1:]:
        append_snapshot(s, src)
        rollup_refresh(spark, src, rup)
    before = _merged(spark, rup)
    compact_snapshots(spark, rup)
    assert _merged(spark, rup) == before == _direct(spark, slices)
    # ...and the watermark survives compaction (meta rides manifests,
    # not segments).
    assert table_meta(rup)["rollup_source_version"] == latest_version(src)
    # Post-compaction incremental refresh still works.
    extra = _events(spark, 240, 30)
    append_snapshot(extra, src)
    r = rollup_refresh(spark, src, rup)
    assert r["mode"] == "incremental"
    assert _merged(spark, rup) == _direct(spark, slices + [extra])


def test_random_walk_matches_direct_aggregate(spark, tmp_path):
    """Model-based: a seeded random interleaving of appends, source
    compactions, and refreshes must always leave the merged rollup
    equal to a direct aggregate over everything appended so far
    (after one final refresh)."""
    import numpy as np

    rng = np.random.default_rng(71)
    src, rup = str(tmp_path / "src"), str(tmp_path / "rup")
    create_table(src)
    appended = []
    lo = 0

    def append():
        nonlocal lo
        n = int(rng.integers(20, 80))
        df = _events(spark, lo, n)
        appended.append(df)
        append_snapshot(df, src)
        lo += n

    append()  # non-empty table before anything else
    for _ in range(12):
        op = rng.choice(["append", "compact", "refresh"])
        if op == "append":
            append()
        elif op == "compact":
            compact_snapshots(spark, src)
        else:
            rollup_refresh(spark, src, rup)
    rollup_refresh(spark, src, rup)
    assert _merged(spark, rup) == _direct(spark, appended)


def test_crash_between_segment_write_and_commit(spark, tmp_path, monkeypatch):
    """Refresh dies AFTER writing its partial segment but BEFORE the
    commit: the orphan is invisible (not in any manifest), the retry
    re-runs the same refresh to the correct result, and no bucket is
    double-counted."""
    from conversation_with_vector_db_spark.sources import rollup as ru

    src, rup = str(tmp_path / "src"), str(tmp_path / "rup")
    create_table(src)
    s1 = _events(spark, 0, 100)
    append_snapshot(s1, src)
    rollup_refresh(spark, src, rup)
    s2 = _events(spark, 100, 100)
    append_snapshot(s2, src)

    real_commit = ru.commit_segments
    calls = {"n": 0}

    def dying_commit(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(ru, "commit_segments", dying_commit)
    try:
        rollup_refresh(spark, src, rup)
        raise AssertionError("refresh should have crashed")
    except RuntimeError:
        pass
    assert calls["n"] == 1
    monkeypatch.setattr(ru, "commit_segments", real_commit)

    # The orphan segment exists on disk but is in no manifest: reads
    # are unaffected and the retry lands the refresh exactly once.
    assert _merged(spark, rup) == _direct(spark, [s1])
    r = rollup_refresh(spark, src, rup)
    assert r["mode"] == "incremental"
    assert _merged(spark, rup) == _direct(spark, [s1, s2])
