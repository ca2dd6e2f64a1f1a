#!/usr/bin/env python3
"""Measure snapshot-log commit cost vs live segment count (VERDICT r4
#1 done-criterion): the delta-manifest shape must hold commit bytes and
wall FLAT as the table grows, where the r4 full-live-set shape grew
both linearly (every append rewrote the whole segment list).

The measurement drives the REAL commit path (_try_commit CAS onto a
table whose live set has N segments) with synthetic segment names, so
it isolates exactly the manifest protocol — the parquet data write is
identical under both shapes and would only blur the comparison.

Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from conversation_with_vector_db_spark.sources.snapshot_log import (  # noqa: E402
    _manifest_path,
    _try_commit,
    _write_checkpoint,
    create_table,
    live_segments,
)


def _seg(i: int) -> str:
    return f"data/{i:032x}"


def measure(n_segments: int, n_commits: int = 50) -> dict:
    """Append ``n_commits`` delta commits onto a table whose head
    already holds ``n_segments`` live segments; report per-commit
    manifest bytes + wall for the delta shape, and the bytes a
    full-live-set manifest would have written at the same head."""
    d = tempfile.mkdtemp(prefix="cvdb_snapcost_")
    try:
        t = os.path.join(d, "t")
        create_table(t)
        base = [_seg(i) for i in range(n_segments)]
        # Install the N-segment head as a checkpoint at v1 (how a real
        # table reaches N segments: many appends + periodic ckpts).
        assert _try_commit(
            t, 1, {"version": 1, "op": "append", "added": base,
                   "removed": []}
        )
        _write_checkpoint(t, 1, base)
        walls, bytes_delta = [], []
        for k in range(n_commits):
            rel = _seg(n_segments + k)
            v = 2 + k
            t0 = time.perf_counter()
            ok = _try_commit(
                t,
                v,
                {"version": v, "op": "append", "added": [rel],
                 "removed": []},
            )
            walls.append(time.perf_counter() - t0)
            assert ok
            bytes_delta.append(os.path.getsize(_manifest_path(t, v)))
        # What the r4 shape would have written for the LAST commit:
        # the full live list at head.
        full_manifest = {
            "version": v,
            "op": "append",
            "added": [rel],
            "removed": [],
            "live": base + [_seg(n_segments + i) for i in range(n_commits)],
        }
        full_bytes = len(json.dumps(full_manifest, sort_keys=True))
        # Reconstruction cost at head (the read-side price of deltas):
        t0 = time.perf_counter()
        live = live_segments(t)
        recon_ms = (time.perf_counter() - t0) * 1e3
        assert len(live) == n_segments + n_commits
        walls.sort()
        return {
            "n_segments": n_segments,
            "delta_manifest_bytes": max(bytes_delta),
            "full_manifest_bytes": full_bytes,
            "commit_wall_ms_p50": round(walls[len(walls) // 2] * 1e3, 3),
            "reconstruct_head_ms": round(recon_ms, 3),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    rows = [measure(n) for n in (100, 1_000, 10_000, 100_000, 1_000_000)]
    print(
        "| live segments | delta manifest B | full manifest B "
        "(r4 shape) | commit p50 ms | reconstruct head ms |"
    )
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_segments']:,} | {r['delta_manifest_bytes']} "
            f"| {r['full_manifest_bytes']:,} "
            f"| {r['commit_wall_ms_p50']} | {r['reconstruct_head_ms']} |"
        )
    print(json.dumps({"snapshot_commit_cost": rows}))


if __name__ == "__main__":
    main()
