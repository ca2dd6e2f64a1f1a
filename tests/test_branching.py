"""Branch refs over the snapshot log (sources/branching.py):
zero-copy fork, isolated writers, metadata-only merge with
segment-level conflict detection, cross-ref GC."""

from __future__ import annotations

import os

import pytest

from conversation_with_vector_db_spark.sources.branching import (
    branch_dir,
    create_branch,
    drop_branch,
    list_branches,
    merge_branch,
    protected_segments,
    vacuum_with_branches,
)
from conversation_with_vector_db_spark.sources.snapshot_log import (
    CommitConflictError,
    append_snapshot,
    compact_snapshots,
    create_table,
    latest_version,
    live_segments,
    read_snapshot,
    rewrite_snapshot,
    vacuum,
)


def _ids(df) -> list[int]:
    return sorted(r["id"] for r in df.collect())


def _mk(spark, tmp_path, lo=0, hi=10):
    t = str(tmp_path / "t")
    create_table(t)
    append_snapshot(spark.range(lo, hi), t)
    return t


def test_branch_is_zero_copy_and_isolated(spark, tmp_path):
    """Creating a branch copies no data; branch writes are invisible
    to the parent and parent writes after the fork are invisible to
    the branch (snapshot semantics of the fork point)."""
    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    assert list_branches(t) == ["dev"]
    # Zero-copy: the branch's own data dir holds nothing yet.
    assert os.listdir(os.path.join(b, "data")) == []
    assert _ids(read_snapshot(spark, b)) == list(range(10))

    append_snapshot(spark.range(100, 105), b)   # branch-only
    append_snapshot(spark.range(200, 205), t)   # parent-only
    assert _ids(read_snapshot(spark, b)) == list(range(10)) + list(
        range(100, 105)
    )
    assert _ids(read_snapshot(spark, t)) == list(range(10)) + list(
        range(200, 205)
    )


def test_merge_appends_is_metadata_only_and_atomic(spark, tmp_path):
    """An append-only branch merges as ONE parent commit, coexisting
    with parent progress since the fork; the merged segment is the
    branch's physical file (no copy)."""
    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    append_snapshot(spark.range(100, 110), b)
    append_snapshot(spark.range(200, 210), t)  # concurrent parent work
    v0 = latest_version(t)
    v = merge_branch(t, "dev")
    assert v == v0 + 1  # exactly one commit
    assert _ids(read_snapshot(spark, t)) == (
        list(range(10)) + list(range(100, 110)) + list(range(200, 210))
    )
    # Zero-copy merge: the new live entry points INTO the ref dir.
    merged = [
        s for s in live_segments(t) if s.startswith("_refs/dev/")
    ]
    assert len(merged) == 1


def test_merge_conflict_when_parent_rewrote_fork_segment(spark, tmp_path):
    """A branch that REWROTE an inherited segment conflicts if the
    parent also rewrote it since the fork — segment-level
    write-write detection via the commit layer."""
    t = _mk(spark, tmp_path)
    seg = live_segments(t)[0]
    b = create_branch(t, "dev")
    # Branch folds the inherited segment into its own rewrite.
    bseg = live_segments(b)[0]
    rewrite_snapshot(spark.range(0, 5), b, remove=[bseg])
    # Parent compacts/rewrites the same segment meanwhile.
    rewrite_snapshot(spark.range(0, 10), t, remove=[seg])
    with pytest.raises(CommitConflictError):
        merge_branch(t, "dev")


def test_merge_carries_branch_rewrites_when_parent_idle(spark, tmp_path):
    """Branch-side rewrite of inherited data merges cleanly when the
    parent left those segments alone: removed set validates, reads
    equal the branch head."""
    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    bseg = live_segments(b)[0]
    rewrite_snapshot(spark.range(50, 55), b, remove=[bseg])
    merge_branch(t, "dev")
    assert _ids(read_snapshot(spark, t)) == list(range(50, 55))


def test_merge_empty_branch_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    create_branch(t, "dev")
    v = latest_version(t)
    assert merge_branch(t, "dev") == v
    assert latest_version(t) == v


def test_drop_branch_guard_until_parent_compacts(spark, tmp_path):
    """Dropping a merged branch is refused while the parent still
    references branch-local segments; after the parent compacts them
    into its own data/ and vacuums the merge window, the drop
    succeeds and the parent still reads correctly."""
    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    append_snapshot(spark.range(100, 110), b)
    merge_branch(t, "dev")
    with pytest.raises(ValueError, match="still backs"):
        drop_branch(t, "dev")
    compact_snapshots(spark, t)
    with pytest.raises(ValueError, match="still backs"):
        drop_branch(t, "dev")  # time-travelable merge window remains
    vacuum(t, keep_versions=1, orphan_min_age_sec=0)
    drop_branch(t, "dev")
    assert list_branches(t) == []
    assert _ids(read_snapshot(spark, t)) == list(range(10)) + list(
        range(100, 110)
    )


def test_vacuum_with_branches_protects_inherited_segments(
    spark, tmp_path
):
    """The parent drops all its original data; a plain vacuum would
    reap the fork's segments out from under the branch — the
    cross-ref pass keeps them, and the branch still reads. After the
    branch is gone, the segments become reclaimable."""
    t = _mk(spark, tmp_path)
    seg = live_segments(t)[0]
    create_branch(t, "dev")
    rewrite_snapshot(spark.range(500, 505), t, remove=[seg])
    assert seg in protected_segments(t)
    deleted = vacuum_with_branches(t, orphan_min_age_sec=0)
    assert seg not in deleted
    b = branch_dir(t, "dev")
    assert _ids(read_snapshot(spark, b)) == list(range(10))
    drop_branch(t, "dev")
    deleted = vacuum_with_branches(t, orphan_min_age_sec=0)
    assert seg in deleted


def test_branch_compaction_localizes_then_parent_merge(spark, tmp_path):
    """Compaction ON the branch folds inherited + branch segments
    into branch-local files; the merge then swaps the parent's fork
    segments for the folded one in a single conflict-checked
    commit."""
    t = _mk(spark, tmp_path)
    append_snapshot(spark.range(10, 20), t)
    b = create_branch(t, "dev")
    append_snapshot(spark.range(100, 105), b)
    compact_snapshots(spark, b, target_bytes=1 << 30)
    assert all(
        not s.startswith("..") for s in live_segments(b)
    )  # fully localized
    merge_branch(t, "dev")
    assert _ids(read_snapshot(spark, t)) == list(range(20)) + list(
        range(100, 105)
    )


def test_fork_snapshot_pins_version_not_head(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v1 = latest_version(t)
    append_snapshot(spark.range(10, 20), t)
    create_branch(t, "old", at_version=v1)
    assert _ids(read_snapshot(spark, branch_dir(t, "old"))) == list(
        range(10)
    )


def test_create_branch_name_validation_and_duplicate(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError):
        create_branch(t, "a/b")
    create_branch(t, "dev")
    with pytest.raises(FileExistsError):
        create_branch(t, "dev")


def test_half_born_ref_counts_for_gc_and_merges(spark, tmp_path):
    """A creator dying between the v0 CAS and branch.json leaves a
    committed fork: it must still protect its segments from GC, and
    a retrying creator repairs the record instead of wedging."""
    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    os.unlink(os.path.join(b, "branch.json"))  # simulate the crash
    assert list_branches(t) == ["dev"]
    seg = [s for s in live_segments(t)][0]
    assert seg in protected_segments(t)
    with pytest.raises(FileExistsError):
        create_branch(t, "dev")  # retry repairs then reports exists
    assert os.path.isfile(os.path.join(b, "branch.json"))
    assert merge_branch(t, "dev") == latest_version(t)  # no-op merge


def test_wap_transactional_mutations_on_branch(spark, tmp_path):
    """Write-audit-publish: keyed upserts/deletes run against a BRANCH
    of a partition-tagged transactional table (all of
    sources/transactional.py works on a ref unchanged — same commit
    layer), the parent keeps ingesting a different partition, and the
    audit-approved state publishes as one merge commit."""
    from conversation_with_vector_db_spark.sources import (
        transactional as tx,
    )

    t = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, i * 10, i % 2) for i in range(20)],
        "id long, val long, namespace int",
    )
    tx.create_partitioned_table(spark, base, t, key="id")

    b = create_branch(t, "audit")
    tx.upsert_by_key(
        spark,
        b,
        spark.createDataFrame(
            [(3, 999, 1), (5, 555, 1)], "id long, val long, namespace int"
        ),
        key="id",
    )
    tx.delete_by_key(
        spark, b, spark.createDataFrame([(7,)], "id long"), key="id"
    )
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(100, 1, 0), (102, 1, 0)], "id long, val long, namespace int"
        ),
        t,
        key="id",
    )

    # Audit on the branch; parent untouched by branch mutations.
    audit = {r["id"]: r["val"] for r in tx.read_table(spark, b).collect()}
    assert audit[3] == 999 and audit[5] == 555 and 7 not in audit
    parent_pre = {
        r["id"]: r["val"] for r in tx.read_table(spark, t).collect()
    }
    assert parent_pre[3] == 30 and 7 in parent_pre

    merge_branch(t, "audit")
    got = {r["id"]: r["val"] for r in tx.read_table(spark, t).collect()}
    want = {i: i * 10 for i in range(20)}
    want.update({3: 999, 5: 555, 100: 1, 102: 1})
    del want[7]
    assert got == want


def test_wap_conflict_when_both_refs_mutate_same_partition(
    spark, tmp_path
):
    """Parent and branch both upsert the SAME partition (both rewrite
    the fork segment): the merge must conflict, not silently pick a
    winner — segment-level write-write detection."""
    from conversation_with_vector_db_spark.sources import (
        transactional as tx,
    )

    t = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, i * 10, i % 2) for i in range(10)],
        "id long, val long, namespace int",
    )
    tx.create_partitioned_table(spark, base, t, key="id")
    b = create_branch(t, "audit")
    tx.upsert_by_key(
        spark,
        b,
        spark.createDataFrame(
            [(2, 1, 0)], "id long, val long, namespace int"
        ),
        key="id",
    )
    tx.upsert_by_key(
        spark,
        t,
        spark.createDataFrame(
            [(4, 2, 0)], "id long, val long, namespace int"
        ),
        key="id",
    )
    with pytest.raises(CommitConflictError):
        merge_branch(t, "audit")


def test_merge_carries_branch_meta_diff(spark, tmp_path):
    """A meta key the branch changed (a watermark, a model pointer)
    rides the merge commit; keys the branch left alone keep the
    parent's newer value."""
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        commit_segments,
        table_meta,
    )

    t = _mk(spark, tmp_path)
    commit_segments(t, added=[], removed=[], op="meta",
                    meta={"wm": 1, "other": "a"})
    b = create_branch(t, "dev")
    commit_segments(b, added=[], removed=[], op="meta", meta={"wm": 5})
    commit_segments(t, added=[], removed=[], op="meta",
                    meta={"other": "z"})  # disjoint parent update
    merge_branch(t, "dev")
    m = table_meta(t)
    assert m["wm"] == 5 and m["other"] == "z"


def test_merge_meta_conflict_when_both_refs_changed_key(spark, tmp_path):
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        commit_segments,
    )

    t = _mk(spark, tmp_path)
    commit_segments(t, added=[], removed=[], op="meta", meta={"wm": 1})
    create_branch(t, "dev")
    b = branch_dir(t, "dev")
    commit_segments(b, added=[], removed=[], op="meta", meta={"wm": 5})
    commit_segments(t, added=[], removed=[], op="meta", meta={"wm": 9})
    with pytest.raises(CommitConflictError, match="BOTH refs"):
        merge_branch(t, "dev")


def test_merge_refuses_branch_local_meta_artifact(spark, tmp_path):
    """A meta pointer naming a file that exists only under the ref
    dir (an IVF centroid sidecar staged on the branch) must refuse to
    merge: the parent could never resolve it once the ref drops."""
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        commit_segments,
    )

    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    side = os.path.join(b, "centroids")
    os.makedirs(side)
    with open(os.path.join(side, "m-x"), "w") as f:
        f.write("{}")
    commit_segments(
        b, added=[], removed=[], op="meta",
        meta={"centroids": "centroids/m-x"},
    )
    with pytest.raises(ValueError, match="branch-local artifact"):
        merge_branch(t, "dev")


def test_concurrent_merges_of_disjoint_branches_both_land(
    spark, tmp_path
):
    """Append-only branches commute: two threads merging two branches
    race the CAS and both land exactly once."""
    import threading

    t = _mk(spark, tmp_path)
    for name, lo in (("b1", 100), ("b2", 200)):
        bd = create_branch(t, name)
        append_snapshot(spark.range(lo, lo + 5), bd)
    errors = []

    def worker(name):
        try:
            merge_branch(t, name)
        except Exception as e:  # noqa: BLE001 - surfaced via errors
            errors.append(e)

    ths = [
        threading.Thread(target=worker, args=(n,)) for n in ("b1", "b2")
    ]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errors
    assert _ids(read_snapshot(spark, t)) == (
        list(range(10)) + list(range(100, 105)) + list(range(200, 205))
    )


def test_branch_of_branch(spark, tmp_path):
    """Nesting works through the generic relative-path rewrite: a
    sub-branch inherits through two ref levels and merges back into
    its immediate parent."""
    t = _mk(spark, tmp_path)
    b1 = create_branch(t, "b1")
    append_snapshot(spark.range(100, 105), b1)
    b2 = create_branch(b1, "b2")
    assert _ids(read_snapshot(spark, b2)) == list(range(10)) + list(
        range(100, 105)
    )
    append_snapshot(spark.range(300, 302), b2)
    merge_branch(b1, "b2")
    assert _ids(read_snapshot(spark, b1)) == (
        list(range(10)) + list(range(100, 105)) + [300, 301]
    )
    # ...and the combined branch merges into the root.
    merge_branch(t, "b1")
    assert _ids(read_snapshot(spark, t)) == (
        list(range(10)) + list(range(100, 105)) + [300, 301]
    )


def test_wap_audit_gate_with_expectations(spark, tmp_path):
    """The full write-audit-publish loop with the quality suite as
    the audit: stage a batch on a branch, run expectation_report
    against the BRANCH head, refuse to merge while any check fails,
    fix on the branch, re-audit, publish. The parent never observes
    the bad rows at any point."""
    from conversation_with_vector_db_spark.operators.expectations import (
        expectation_report,
    )
    from conversation_with_vector_db_spark.sources import (
        transactional as tx,
    )
    from conversation_with_vector_db_spark.sources.branching import (
        branch_dir,
        create_branch,
        merge_branch,
    )

    t = str(tmp_path / "wap_exp")
    base = spark.createDataFrame(
        [(1, "O", 0), (2, "F", 0)],
        "k: long, status: string, namespace: int",
    )
    tx.create_partitioned_table(spark, base, t)

    create_branch(t, "audit")
    bdir = branch_dir(t, "audit")
    # Stage a batch containing violations ON THE BRANCH.
    staged = spark.createDataFrame(
        [(3, "P", 1), (4, "X", 1), (None, "O", 1)],
        "k: long, status: string, namespace: int",
    )
    tx.append_partitioned(spark, staged, bdir)

    specs = [
        ("not_null", "k"),
        ("values_in", "status", ("O", "F", "P")),
    ]

    def audit_passed(table):
        rows = expectation_report(
            tx.read_table(spark, table), specs
        ).collect()
        return all(r["passed"] for r in rows)

    assert not audit_passed(bdir)
    # Parent untouched and still clean.
    assert audit_passed(t)
    assert tx.read_table(spark, t).count() == 2

    # Remediate on the branch: drop the violating rows, then re-audit.
    tx.delete_where(
        spark, bdir, "k IS NULL OR status NOT IN ('O', 'F', 'P')"
    )
    assert audit_passed(bdir)
    merge_branch(t, "audit")
    got = {
        (r["k"], r["status"])
        for r in tx.read_table(spark, t).collect()
    }
    # The good staged row published; both violations never reached
    # the parent.
    assert got == {(1, "O"), (2, "F"), (3, "P")}


def test_remerge_is_idempotent_no_row_duplication(spark, tmp_path):
    """Merging twice (ambiguous-failure retry) must publish nothing
    the second time — before the merge-bookkeeping fix a re-merge
    re-added the same segments and every merged row duplicated."""
    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    append_snapshot(spark.range(100, 103), b)
    merge_branch(t, "dev")
    v = latest_version(t)
    merge_branch(t, "dev")  # retry: no-op
    assert latest_version(t) == v
    assert _ids(read_snapshot(spark, t)) == list(range(10)) + [
        100, 101, 102,
    ]


def test_incremental_merge_publishes_only_new_segments(
    spark, tmp_path
):
    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    append_snapshot(spark.range(100, 103), b)
    merge_branch(t, "dev")
    append_snapshot(spark.range(200, 202), b)  # keep working
    merge_branch(t, "dev")  # second merge: just the new batch
    assert _ids(read_snapshot(spark, t)) == (
        list(range(10)) + [100, 101, 102, 200, 201]
    )
    # And a third merge is again a no-op.
    v = latest_version(t)
    merge_branch(t, "dev")
    assert latest_version(t) == v


def test_merge_survives_branch_side_vacuum(spark, tmp_path):
    """branch.json records the fork META too, so merge no longer
    depends on the branch's own v0 manifest surviving vacuum."""
    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    for i in range(4):
        append_snapshot(spark.range(100 + i, 101 + i), b)
    vacuum(b, keep_versions=1, orphan_min_age_sec=0.0)
    with pytest.raises(FileNotFoundError):
        # v0 manifest really is gone...
        from conversation_with_vector_db_spark.sources.snapshot_log import (  # noqa: E501
            _read_manifest,
        )

        _read_manifest(b, 0)
    merge_branch(t, "dev")  # ...and the merge still lands
    got = set(_ids(read_snapshot(spark, t)))
    assert {100, 101, 102, 103} <= got


def test_drop_branch_refuses_while_nested_ref_segments_held(
    spark, tmp_path
):
    """Nested-ref segments ('_refs/b/_refs/sb/data/...') in the
    parent's live set must hold the drop — the old data/-only prefix
    missed them and deleted parent-referenced files."""
    t = _mk(spark, tmp_path)
    b = create_branch(t, "b")
    sb = create_branch(b, "sb")
    append_snapshot(spark.range(500, 503), sb)
    merge_branch(b, "sb")
    merge_branch(t, "b")
    with pytest.raises(ValueError, match="still backs"):
        drop_branch(t, "b")
    assert 500 in set(_ids(read_snapshot(spark, t)))


def test_drop_branch_refuses_while_sibling_inherits(spark, tmp_path):
    """A sibling fork taken while a merged '_refs/b/...' segment was
    live embeds it in ITS fork set; dropping b would tear the
    sibling even after the parent itself compacted past it."""
    t = _mk(spark, tmp_path)
    b = create_branch(t, "b")
    append_snapshot(spark.range(300, 303), b)
    merge_branch(t, "b")
    create_branch(t, "c")  # inherits '_refs/b/data/...'
    compact_snapshots(spark, t)  # parent folds it into data/
    # The branch-safe GC must protect the sibling-inherited
    # '_refs/b/...' path (not just root data/ segments).
    vacuum_with_branches(t, keep_versions=1, orphan_min_age_sec=0.0)
    with pytest.raises(ValueError, match="another ref"):
        drop_branch(t, "b")
    # The sibling still reads its fork state intact.
    c = branch_dir(t, "c")
    assert 300 in set(_ids(read_snapshot(spark, c)))


def test_restore_to_current_state_is_version_free(spark, tmp_path):
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        restore_table,
    )

    t = _mk(spark, tmp_path)
    v = latest_version(t)
    assert restore_table(t, v) == v  # no useless empty commit
    assert latest_version(t) == v


def test_foreign_file_in_refs_dir_is_ignored(spark, tmp_path):
    t = _mk(spark, tmp_path)
    create_branch(t, "dev")
    os.makedirs(os.path.join(t, "_refs"), exist_ok=True)
    with open(os.path.join(t, "_refs", ".DS_Store"), "w") as f:
        f.write("junk")
    assert list_branches(t) == ["dev"]  # no NotADirectoryError
    assert protected_segments(t)  # GC walk survives too


def test_merge_racing_twin_same_ref_idempotent(
    spark, tmp_path, monkeypatch
):
    """Two merges of the SAME ref racing (VERDICT r8 #2): the loser's
    CAS fails, and its re-plan must see what its twin just published
    — both the parent's new live set AND the ref's published-set
    bookkeeping — so it returns idempotent success (the twin already
    landed the merge) instead of raising a spurious 'parent rewrote
    them' conflict. Simulated deterministically: the loser's first
    commit attempt runs the twin's FULL merge, then loses the CAS."""
    import conversation_with_vector_db_spark.sources.branching as br

    t = _mk(spark, tmp_path)
    b = create_branch(t, "dev")
    # Rewrite an inherited segment on the branch: the merge carries a
    # non-empty `removed` set (the path the stale-bookkeeping bug
    # turned into a spurious conflict).
    bseg = live_segments(b)[0]
    rewrite_snapshot(spark.range(50, 55), b, remove=[bseg])

    real = br.commit_segments

    def losing_commit(table_dir, **kw):
        monkeypatch.setattr(br, "commit_segments", real)
        merge_branch(t, "dev")  # the twin wins the race
        raise CommitConflictError("lost the CAS to the twin")

    monkeypatch.setattr(br, "commit_segments", losing_commit)
    v = merge_branch(t, "dev")  # the loser: must no-op, not raise
    assert v == latest_version(t)
    assert _ids(read_snapshot(spark, t)) == list(range(50, 55))
    # Exactly once: the rewrite applied a single time.
    merged = [
        s for s in live_segments(t) if s.startswith("_refs/dev/")
    ]
    assert len(merged) == 1
