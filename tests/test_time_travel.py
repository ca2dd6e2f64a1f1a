"""TIMESTAMP AS OF (snapshot_log.commit_timestamp /
version_at_timestamp): in-commit stamps, running-max monotonicity
under writer clock skew, mtime fallback for pre-stamp manifests, and
the datasource option."""

from __future__ import annotations

import json
import os
import time

import pytest

from conversation_with_vector_db_spark.sources.datasource import register
from conversation_with_vector_db_spark.sources.snapshot_log import (
    _manifest_path,
    _read_manifest,
    _try_commit,
    append_snapshot,
    commit_timestamp,
    create_table,
    latest_version,
    read_snapshot,
    table_history,
    version_at_timestamp,
)


def _ids(df) -> list[int]:
    return sorted(r["id"] for r in df.collect())


def test_timestamp_as_of_resolves_between_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 5), t)  # v1
    t1 = commit_timestamp(t, 1)
    time.sleep(0.05)
    append_snapshot(spark.range(5, 8), t)  # v2
    t2 = commit_timestamp(t, 2)
    assert t2 > t1
    mid = (t1 + t2) / 2
    assert version_at_timestamp(t, mid) == 1
    assert version_at_timestamp(t, t2) == 2
    assert version_at_timestamp(t, time.time() + 60) == 2  # future: head
    with pytest.raises(ValueError, match="no committed version"):
        version_at_timestamp(t, t1 - 3600)
    assert _ids(
        read_snapshot(spark, t, version=version_at_timestamp(t, mid))
    ) == list(range(5))


def test_clock_skew_never_regresses_resolution(spark, tmp_path):
    # A racing writer with a slow clock stamps v2 BEFORE v1's stamp.
    # The running-max effective time keeps version order and time
    # order agreeing: no timestamp resolves to v1 after v2 exists
    # with an earlier raw stamp.
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 5), t)  # v1
    t1 = commit_timestamp(t, 1)
    m = dict(_read_manifest(t, 1))
    m.update(version=2, ts=t1 - 100.0, added=[], removed=[])
    m.pop("live", None)
    assert _try_commit(t, 2, m)
    assert version_at_timestamp(t, t1) == 2  # v2's EFFECTIVE time = t1
    # The raw regressed stamp never creates a window where v2 predates
    # v1 (or the table's creation): before every effective time, the
    # lookup refuses rather than resolving v2.
    with pytest.raises(ValueError):
        version_at_timestamp(t, t1 - 50)


def test_mtime_fallback_for_prestamp_manifests(spark, tmp_path):
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 3), t)  # v1
    m = dict(_read_manifest(t, 1))
    m.update(version=2, added=[], removed=[])
    m.pop("ts", None)
    m.pop("live", None)
    assert _try_commit(t, 2, m)  # a pre-stamp-era manifest
    got = commit_timestamp(t, 2)
    assert abs(got - os.path.getmtime(_manifest_path(t, 2))) < 1e-6
    assert version_at_timestamp(t, time.time() + 1) == 2
    hist = {
        r["version"]: r["commit_ts"]
        for r in table_history(spark, t).collect()
    }
    assert hist[1] is not None and hist[2] is not None


def test_datasource_timestamp_as_of(spark, tmp_path):
    register(spark)
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(0, 5), t)  # v1
    t1 = commit_timestamp(t, 1)
    time.sleep(0.05)
    append_snapshot(spark.range(5, 8), t)  # v2
    t2 = commit_timestamp(t, 2)
    df = (
        spark.read.format("snapshot_log")
        .option("path", t)
        .option("timestampAsOf", str((t1 + t2) / 2))
        .load()
    )
    assert _ids(df) == list(range(5))
    with pytest.raises(Exception, match="not both"):
        (
            spark.read.format("snapshot_log")
            .option("path", t)
            .option("version", "1")
            .option("timestampAsOf", str(t2))
            .load()
            .collect()
        )
