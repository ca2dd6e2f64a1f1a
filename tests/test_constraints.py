"""CHECK constraints (sources/transactional.py): add-time validation,
write-time refusal across every row-introducing path, NULL semantics,
drop, and time-travel visibility."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from conversation_with_vector_db_spark.sources import transactional as tx
from conversation_with_vector_db_spark.sources.snapshot_log import (
    latest_version,
)


@pytest.fixture()
def tdir():
    yield os.path.join(
        tempfile.gettempdir(), "cvdb_check_test", uuid.uuid4().hex
    )


def _mk(spark, tdir, rows=((1, 2, 0), (2, 3, 1))):
    df = spark.createDataFrame(
        list(rows), "vec_id: long, label: int, namespace: int"
    )
    tx.create_partitioned_table(spark, df, tdir)


def _state(spark, tdir):
    return {
        (r["vec_id"], r["namespace"]): r["label"]
        for r in tx.read_table(spark, tdir).collect()
    }


def test_add_validates_existing_rows(spark, tdir):
    _mk(spark, tdir, [(1, -5, 0)])
    with pytest.raises(
        tx.ConstraintViolationError, match="existing"
    ):
        tx.add_check_constraint(
            spark, tdir, "nonneg", "label >= 0"
        )
    assert "nonneg" not in tx.table_constraints(tdir)


def test_append_refused_and_table_unchanged(spark, tdir):
    _mk(spark, tdir)
    tx.add_check_constraint(spark, tdir, "nonneg", "label >= 0")
    v = latest_version(tdir)
    bad = spark.createDataFrame(
        [(5, -1, 0)], "vec_id: long, label: int, namespace: int"
    )
    with pytest.raises(tx.ConstraintViolationError, match="nonneg"):
        tx.append_partitioned(spark, bad, tdir)
    assert latest_version(tdir) == v
    assert (5, 0) not in _state(spark, tdir)
    # A clean append still lands.
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(5, 1, 0)], "vec_id: long, label: int, namespace: int"
        ),
        tdir,
    )
    assert _state(spark, tdir)[(5, 0)] == 1


def test_upsert_and_merge_refused(spark, tdir):
    _mk(spark, tdir)
    tx.add_check_constraint(spark, tdir, "nonneg", "label >= 0")
    v = latest_version(tdir)
    bad = spark.createDataFrame(
        [(1, -9, 0)], "vec_id: long, label: int, namespace: int"
    )
    with pytest.raises(tx.ConstraintViolationError):
        tx.upsert_by_key(spark, tdir, bad, key="vec_id")
    with pytest.raises(tx.ConstraintViolationError):
        tx.merge_into(spark, tdir, bad, key="vec_id")
    assert latest_version(tdir) == v
    assert _state(spark, tdir)[(1, 0)] == 2


def test_null_predicate_counts_as_violation(spark, tdir):
    # CHECK semantics here are fail-closed: a row where the predicate
    # is NULL is NOT provably conformant and is refused.
    _mk(spark, tdir)
    tx.add_check_constraint(spark, tdir, "nonneg", "label >= 0")
    bad = spark.createDataFrame(
        [(7, None, 0)], "vec_id: long, label: int, namespace: int"
    )
    with pytest.raises(tx.ConstraintViolationError):
        tx.append_partitioned(spark, bad, tdir)


def test_drop_constraint_reopens_writes(spark, tdir):
    _mk(spark, tdir)
    tx.add_check_constraint(spark, tdir, "nonneg", "label >= 0")
    tx.drop_check_constraint(tdir, "nonneg")
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(9, -3, 0)], "vec_id: long, label: int, namespace: int"
        ),
        tdir,
    )
    assert _state(spark, tdir)[(9, 0)] == -3


def test_multiple_constraints_reported_together(spark, tdir):
    _mk(spark, tdir)
    tx.add_check_constraint(spark, tdir, "nonneg", "label >= 0")
    tx.add_check_constraint(
        spark, tdir, "small_ns", "namespace <= 5"
    )
    bad = spark.createDataFrame(
        [(8, -1, 9)], "vec_id: long, label: int, namespace: int"
    )
    with pytest.raises(
        tx.ConstraintViolationError, match="nonneg"
    ) as ei:
        tx.append_partitioned(spark, bad, tdir)
    assert "small_ns" in str(ei.value)


def test_constraint_free_tables_pay_nothing_extra(spark, tdir):
    # No constraints -> the enforcement hook is a metadata read only;
    # writes behave exactly as before (smoke: plain lifecycle works).
    _mk(spark, tdir)
    tx.upsert_by_key(
        spark,
        tdir,
        spark.createDataFrame(
            [(1, 50, 0)], "vec_id: long, label: int, namespace: int"
        ),
        key="vec_id",
    )
    assert _state(spark, tdir)[(1, 0)] == 50


def test_constraints_enforced_on_evolved_appends(spark, tdir):
    """The schema-evolution write path enforces CHECK constraints
    too, through the declared-schema read: a violating append is
    refused, and an append that OMITS a constrained column is
    fail-closed refused (omitted = NULL = not provably conformant)."""
    from conversation_with_vector_db_spark.sources import (
        evolution as ev,
    )

    ev.create_evolved_table(
        spark.createDataFrame([(1, "a")], "id: long, txt: string"),
        tdir,
    )
    # Widen with a score column, then constrain it.
    ev.append_evolved(
        spark.createDataFrame(
            [(2, "b", 5.0)], "id: long, txt: string, score: double"
        ),
        tdir,
    )
    with pytest.raises(tx.ConstraintViolationError):
        # Rows predating the column read score as NULL: fail-closed,
        # so the constraint is not addable over the current table.
        tx.add_check_constraint(
            spark, tdir, "pos_score", "score >= 0"
        )
    tx.add_check_constraint(
        spark, tdir, "pos_score", "coalesce(score, 0) >= 0"
    )
    v = latest_version(tdir)
    with pytest.raises(tx.ConstraintViolationError):
        ev.append_evolved(
            spark.createDataFrame(
                [(3, "c", -1.0)],
                "id: long, txt: string, score: double",
            ),
            tdir,
        )
    assert latest_version(tdir) == v  # refused atomically
    # Conformant append (omitting score passes the coalesce form).
    ev.append_evolved(
        spark.createDataFrame([(4, "d")], "id: long, txt: string"),
        tdir,
    )
    got = {
        r["id"]: r["score"]
        for r in ev.read_evolved(spark, tdir).collect()
    }
    assert got == {1: None, 2: 5.0, 4: None}
    # A strict constraint over a fresh strict column IS addable when
    # every row conforms after a full rewrite-free widen + backfill
    # is out of scope — the fail-closed refusal above is the pinned
    # contract.


def test_constraint_added_on_branch_carries_through_merge(
    spark, tdir
):
    """Governance-as-WAP: a CHECK constraint staged on a BRANCH rides
    the merge's atomic meta-diff carry — after publish, the PARENT
    enforces it; before publish, the parent does not."""
    from conversation_with_vector_db_spark.sources.branching import (
        branch_dir,
        create_branch,
        merge_branch,
    )

    _mk(spark, tdir)
    create_branch(tdir, "audit")
    bdir = branch_dir(tdir, "audit")
    tx.add_check_constraint(spark, bdir, "nonneg", "label >= 0")
    # Parent unaffected while the branch stages.
    assert tx.table_constraints(tdir) == {}
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(7, -1, 0)], "vec_id: long, label: int, namespace: int"
        ),
        tdir,
    )
    # That violating parent row blocks the merge? No — merge carries
    # the META; Delta's ADD CONSTRAINT validates at ADD time, and the
    # branch validated ITS snapshot. The parent gained a violating
    # row concurrently: the carried key conflicts with nothing, so
    # the merge lands and FUTURE parent writes are gated.
    merge_branch(tdir, "audit")
    assert tx.table_constraints(tdir) == {
        "nonneg": "label >= 0"
    }
    with pytest.raises(tx.ConstraintViolationError):
        tx.append_partitioned(
            spark,
            spark.createDataFrame(
                [(8, -2, 0)],
                "vec_id: long, label: int, namespace: int",
            ),
            tdir,
        )


def test_constraint_added_between_staging_and_commit_is_enforced(
    spark, tdir
):
    """The OCC metadata-revalidation hole, closed: enforcement runs
    per CAS attempt (commit_segments pre_commit), so a constraint
    whose ADD commits after a writer STAGED violating rows — but
    before that writer's CAS — still refuses the write."""
    from conversation_with_vector_db_spark.sources.snapshot_log import (
        commit_segments,
        segment_path,
    )

    _mk(spark, tdir)
    bad = spark.createDataFrame(
        [(5, -1, 0)], "vec_id: long, label: int, namespace: int"
    )
    rels = tx._stage_partition_segments(bad, tdir, "namespace")
    # The rule lands AFTER staging (another session's ALTER TABLE).
    tx.add_check_constraint(spark, tdir, "nonneg", "label >= 0")
    v = latest_version(tdir)
    with pytest.raises(tx.ConstraintViolationError):
        try:
            commit_segments(
                tdir,
                added=rels,
                removed=[],
                op="append",
                pre_commit=tx._constraints_pre_commit(
                    spark, tdir, rels
                ),
            )
        except Exception:
            tx._cleanup(tdir, rels)
            raise
    assert latest_version(tdir) == v
    assert (5, 0) not in _state(spark, tdir)
    import os

    assert not os.path.exists(segment_path(tdir, rels[0]))


def _mk_parent(spark, pdir, keys=(0, 1, 2)):
    tx.create_partitioned_table(
        spark,
        spark.createDataFrame(
            [(k, k * 10, k) for k in keys],
            "vec_id: long, label: int, namespace: int",
        ),
        pdir,
    )


def test_foreign_key_add_validates_and_blocks_orphans(
    spark, tdir
):
    parent = tdir + "_parent"
    _mk_parent(spark, parent)
    _mk(spark, tdir, [(1, 2, 0), (2, 3, 1)])
    tx.add_foreign_key(
        spark, tdir, "fk_ns", "namespace", parent, "namespace"
    )
    v = latest_version(tdir)
    with pytest.raises(
        tx.ConstraintViolationError, match="FOREIGN KEY"
    ):
        tx.append_partitioned(
            spark,
            spark.createDataFrame(
                [(9, 1, 7)],  # namespace 7 has no parent
                "vec_id: long, label: int, namespace: int",
            ),
            tdir,
        )
    assert latest_version(tdir) == v
    # Conformant insert lands; NULL FK passes (SQL semantics).
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(9, 1, 2), (10, 1, None)],
            "vec_id: long, label: int, namespace: int",
        ),
        tdir,
    )
    got = {r["vec_id"] for r in tx.read_table(spark, tdir).collect()}
    assert {9, 10} <= got


def test_foreign_key_not_addable_over_orphaned_rows(spark, tdir):
    parent = tdir + "_parent"
    _mk_parent(spark, parent, keys=(0,))
    _mk(spark, tdir, [(1, 2, 0), (2, 3, 5)])  # 5 is an orphan
    with pytest.raises(
        tx.ConstraintViolationError, match="existing"
    ):
        tx.add_foreign_key(
            spark, tdir, "fk_ns", "namespace", parent, "namespace"
        )
    assert tx.table_foreign_keys(tdir) == {}


def test_foreign_key_drop_reopens_and_merge_enforced(spark, tdir):
    parent = tdir + "_parent"
    _mk_parent(spark, parent)
    _mk(spark, tdir, [(1, 2, 0)])
    tx.add_foreign_key(
        spark, tdir, "fk_ns", "namespace", parent, "namespace"
    )
    with pytest.raises(tx.ConstraintViolationError):
        tx.merge_into(
            spark,
            tdir,
            spark.createDataFrame(
                [(7, 1, 9)],
                "vec_id: long, label: int, namespace: int",
            ),
            key="vec_id",
        )
    tx.drop_foreign_key(tdir, "fk_ns")
    tx.merge_into(
        spark,
        tdir,
        spark.createDataFrame(
            [(7, 1, 9)], "vec_id: long, label: int, namespace: int"
        ),
        key="vec_id",
    )
    assert (7, 9) in _state(spark, tdir)


def test_unique_constraint_blocks_duplicate_appends(spark, tdir):
    _mk(spark, tdir, [(1, 2, 0), (2, 3, 1)])
    tx.add_unique_constraint(spark, tdir, "pk", ["vec_id"])
    v = latest_version(tdir)
    # Duplicate WITHIN the write.
    with pytest.raises(tx.ConstraintViolationError, match="within"):
        tx.append_partitioned(
            spark,
            spark.createDataFrame(
                [(9, 1, 0), (9, 2, 0)],
                "vec_id: long, label: int, namespace: int",
            ),
            tdir,
        )
    # Duplicate AGAINST the table.
    with pytest.raises(tx.ConstraintViolationError, match="already"):
        tx.append_partitioned(
            spark,
            spark.createDataFrame(
                [(1, 99, 0)],
                "vec_id: long, label: int, namespace: int",
            ),
            tdir,
        )
    assert latest_version(tdir) == v
    # Fresh keys land; keyed upserts stay allowed (fold on the key
    # preserves uniqueness by construction).
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(9, 1, 0)], "vec_id: long, label: int, namespace: int"
        ),
        tdir,
    )
    tx.upsert_by_key(
        spark,
        tdir,
        spark.createDataFrame(
            [(1, 50, 0)], "vec_id: long, label: int, namespace: int"
        ),
        key="vec_id",
    )
    assert _state(spark, tdir)[(1, 0)] == 50


def test_unique_not_addable_over_duplicates_and_droppable(
    spark, tdir
):
    _mk(spark, tdir, [(1, 2, 0), (1, 3, 1)])  # vec_id repeats
    with pytest.raises(tx.ConstraintViolationError, match="repeat"):
        tx.add_unique_constraint(spark, tdir, "pk", ["vec_id"])
    # Composite-key form: (vec_id, namespace) IS unique here.
    tx.add_unique_constraint(
        spark, tdir, "pk2", ["vec_id", "namespace"]
    )
    with pytest.raises(tx.ConstraintViolationError):
        tx.append_partitioned(
            spark,
            spark.createDataFrame(
                [(1, 9, 1)],
                "vec_id: long, label: int, namespace: int",
            ),
            tdir,
        )
    tx.drop_unique_constraint(tdir, "pk2")
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(1, 9, 1)], "vec_id: long, label: int, namespace: int"
        ),
        tdir,
    )


def test_unique_allows_multiple_null_keys(spark, tdir):
    """SQL UNIQUE ignores NULL keys (VERDICT r8 #1 regression): two
    NULL-keyed rows in ONE write land; a NULL-keyed row 'matching' an
    existing NULL lands; and add_unique_constraint succeeds over a
    table already holding NULL duplicates."""
    _mk(spark, tdir, [(1, 2, 0), (None, 3, 0)])
    tx.add_unique_constraint(spark, tdir, "pk", ["vec_id"])
    # Two NULL keys within one write: allowed.
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(None, 4, 0), (None, 5, 1)],
            "vec_id: long, label: int, namespace: int",
        ),
        tdir,
    )
    # A NULL key against existing NULLs: allowed.
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(None, 6, 0)], "vec_id: long, label: int, namespace: int"
        ),
        tdir,
    )
    # Non-NULL duplicates are still refused.
    with pytest.raises(tx.ConstraintViolationError, match="already"):
        tx.append_partitioned(
            spark,
            spark.createDataFrame(
                [(1, 9, 1)], "vec_id: long, label: int, namespace: int"
            ),
            tdir,
        )
    labels = sorted(
        r["label"]
        for r in tx.read_table(spark, tdir)
        .where(F.col("vec_id").isNull())
        .collect()
    )
    assert labels == [3, 4, 5, 6]


def test_add_unique_over_existing_null_dups(spark, tdir):
    _mk(spark, tdir, [(None, 1, 0), (None, 2, 0), (3, 3, 1)])
    tx.add_unique_constraint(spark, tdir, "pk", ["vec_id"])
    assert "pk" in tx.table_unique_constraints(tdir)


def test_unique_composite_any_null_ignored(spark, tdir):
    """Composite keys: a row with ANY constraint column NULL
    participates in no uniqueness relation (SQL standard)."""
    _mk(spark, tdir, [(1, 2, 0)])
    tx.add_unique_constraint(
        spark, tdir, "pk", ["vec_id", "label"]
    )
    # (1, NULL) twice in one write: allowed — label is NULL.
    tx.append_partitioned(
        spark,
        spark.createDataFrame(
            [(1, None, 0), (1, None, 1)],
            "vec_id: long, label: int, namespace: int",
        ),
        tdir,
    )
    # A full non-NULL duplicate of an existing (vec_id, label): refused.
    with pytest.raises(tx.ConstraintViolationError):
        tx.append_partitioned(
            spark,
            spark.createDataFrame(
                [(1, 2, 1)], "vec_id: long, label: int, namespace: int"
            ),
            tdir,
        )


def test_unique_nonidentity_cols_enforced_on_upsert_and_merge(
    spark, tdir
):
    """ADVICE r8: a keyed upsert/merge folds on (partition, key) —
    that guarantees UNIQUE constraints whose cols CONTAIN the
    identity, and ONLY those. A UNIQUE on a different column (email
    shape: here `label`) must still be probed on these write paths."""
    _mk(spark, tdir, [(1, 10, 0), (2, 20, 1)])
    tx.add_unique_constraint(spark, tdir, "ulabel", ["label"])
    # Upsert rewriting vec_id=1 with a label that duplicates the row
    # in the OTHER (untouched) partition: refused.
    with pytest.raises(
        tx.ConstraintViolationError, match="ulabel"
    ):
        tx.upsert_by_key(
            spark,
            tdir,
            spark.createDataFrame(
                [(1, 20, 0)],
                "vec_id: long, label: int, namespace: int",
            ),
            key="vec_id",
        )
    # Merge with the same clash: refused.
    with pytest.raises(tx.ConstraintViolationError, match="ulabel"):
        tx.merge_into(
            spark,
            tdir,
            spark.createDataFrame(
                [(1, 20, 0)],
                "vec_id: long, label: int, namespace: int",
            ),
            key="vec_id",
        )
    # A non-clashing upsert lands — including re-writing a row with
    # its OWN existing label (the pre-image lives in a segment this
    # commit removes, which the probe must exclude).
    tx.upsert_by_key(
        spark,
        tdir,
        spark.createDataFrame(
            [(1, 10, 0)], "vec_id: long, label: int, namespace: int"
        ),
        key="vec_id",
    )
    assert _state(spark, tdir)[(1, 0)] == 10
    # Constraints whose cols contain the fold identity are still
    # skipped (no probe cost): upsert same key with a fresh label.
    tx.add_unique_constraint(
        spark, tdir, "pk", ["vec_id", "namespace"]
    )
    tx.upsert_by_key(
        spark,
        tdir,
        spark.createDataFrame(
            [(1, 11, 0)], "vec_id: long, label: int, namespace: int"
        ),
        key="vec_id",
    )
    assert _state(spark, tdir)[(1, 0)] == 11


def test_add_check_revalidates_when_write_races_the_add(
    spark, tdir, monkeypatch
):
    """ADVICE r8 (medium): ADD CONSTRAINT validates existing data
    inside its commit's per-CAS-attempt hook, so a write whose commit
    lands between the ADD's validation and its CAS is re-checked —
    the ADD must refuse to publish a rule the table already violates.
    The race is simulated by landing a violating append from inside
    the ADD's commit path, i.e. after any up-front validation ran."""
    _mk(spark, tdir)  # labels all >= 0
    bad = spark.createDataFrame(
        [(9, -1, 0)], "vec_id: long, label: int, namespace: int"
    )
    real = tx.commit_segments

    def racing(table_dir, **kw):
        monkeypatch.setattr(tx, "commit_segments", real)
        tx.append_partitioned(spark, bad, tdir)  # the racing writer
        return real(table_dir, **kw)

    monkeypatch.setattr(tx, "commit_segments", racing)
    with pytest.raises(tx.ConstraintViolationError, match="existing"):
        tx.add_check_constraint(spark, tdir, "nonneg", "label >= 0")
    assert "nonneg" not in tx.table_constraints(tdir)
    # The raced write itself stays (it committed first and no rule
    # bound it); a retried ADD still refuses over it.
    with pytest.raises(tx.ConstraintViolationError):
        tx.add_check_constraint(spark, tdir, "nonneg", "label >= 0")


def test_add_unique_revalidates_when_write_races_the_add(
    spark, tdir, monkeypatch
):
    _mk(spark, tdir, [(1, 2, 0)])
    dup = spark.createDataFrame(
        [(1, 3, 1)], "vec_id: long, label: int, namespace: int"
    )
    real = tx.commit_segments

    def racing(table_dir, **kw):
        monkeypatch.setattr(tx, "commit_segments", real)
        tx.append_partitioned(spark, dup, tdir)
        return real(table_dir, **kw)

    monkeypatch.setattr(tx, "commit_segments", racing)
    with pytest.raises(tx.ConstraintViolationError, match="repeat"):
        tx.add_unique_constraint(spark, tdir, "pk", ["vec_id"])
    assert "pk" not in tx.table_unique_constraints(tdir)


def test_add_foreign_key_revalidates_when_write_races_the_add(
    spark, tdir, monkeypatch
):
    parent = tdir + "_parent"
    _mk_parent(spark, parent, keys=(0, 1))
    _mk(spark, tdir, [(1, 2, 0)])
    orphan = spark.createDataFrame(
        [(9, 1, 7)], "vec_id: long, label: int, namespace: int"
    )
    real = tx.commit_segments

    def racing(table_dir, **kw):
        monkeypatch.setattr(tx, "commit_segments", real)
        tx.append_partitioned(spark, orphan, tdir)
        return real(table_dir, **kw)

    monkeypatch.setattr(tx, "commit_segments", racing)
    with pytest.raises(tx.ConstraintViolationError, match="existing"):
        tx.add_foreign_key(
            spark, tdir, "fk_ns", "namespace", parent, "namespace"
        )
    assert tx.table_foreign_keys(tdir) == {}
