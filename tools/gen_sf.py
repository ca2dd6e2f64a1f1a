#!/usr/bin/env python3
"""Deterministic fixture generator for scale-factor sweeps.

Reproduces the driver's synthetic tables (TESTDATA.md: TPC-H-ish star
schema + `events` + `documents` + `embeddings`) at ARBITRARY scale
factor, matching the shapes measured on the provided sf0.001/0.01/0.1
fixtures: row-count coefficients, value distributions (exponential
event values, unit-norm 64-d embeddings, 31-word document vocabulary,
fixed Jan-2024 event window whose DENSITY scales with sf), and the
plain timestamp[us] physical layout of the r3 fixtures.

Purpose: measuring the Spark-vs-DuckDB crossover at sf >= 1 (the
driver only ships up to sf0.1). NOT for correctness gating — the
oracle parity gate stays on the driver's own files.

Usage: python tools/gen_sf.py --sf 1 --out /root/repo/.localdata/sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000  # microseconds per second

ADJ = ["blue", "cold", "dark", "fast", "hot", "large", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["LARGE", "STANDARD", "SMALL", "ECONOMY", "MEDIUM", "PROMO"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]


def counts(sf: float) -> dict[str, int]:
    """Row-count coefficients fitted to the driver fixtures
    (documents/embeddings floor at 500 — both are 500 at sf<=0.01 and
    linear above)."""
    return {
        "customer": int(150_000 * sf),
        "supplier": int(10_000 * sf),
        "part": int(200_000 * sf),
        "orders": int(1_500_000 * sf),
        "lineitem": int(6_000_000 * sf),
        "events": int(1_000_000 * sf),
        "documents": max(500, int(50_000 * sf)),
        "embeddings": max(500, int(20_000 * sf)),
    }


def ts_us(iso: str) -> int:
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * US


def write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table, os.path.join(out, f"{name}.parquet"), compression="zstd"
    )
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list; generate only these tables (default: all). "
        "Lets an sf100 events-only sweep skip the 600M-row lineitem "
        "build it doesn't need.",
    )
    ap.add_argument(
        "--partition-events",
        action="store_true",
        help="write events as a hive-partitioned dataset "
        "(events.parquet/dt=YYYY-MM-DD/...) instead of one file — "
        "SURVEY §7's 'partition events by date' 100 TB layout; "
        "session.load_table_in_range prunes whole partition dirs on "
        "it (PartitionFilters). Values are identical to the flat "
        "layout; only the physical layout differs.",
    )
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None

    def want(name: str) -> bool:
        return only is None or name in only

    os.makedirs(args.out, exist_ok=True)
    n = counts(args.sf)
    # One shared rng stream in table order: a --tables subset SKIPS the
    # draws of omitted tables, so subset output is deterministic but
    # not byte-identical to the same table from a full generation —
    # fine for wall-clock sweeps, do not mix with full fixtures.
    rng = np.random.default_rng(args.seed)
    print(f"generating sf{args.sf} -> {args.out}")

    if want("region"):
        write(args.out, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        }))
    if want("nation"):
        write(args.out, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array(
                [i % 5 for i in range(25)], pa.int32()
            ),
        }))

    nc, ns, npart = n["customer"], n["supplier"], n["part"]
    no, nl, ne = n["orders"], n["lineitem"], n["events"]
    if want("customer"):
        write(args.out, "customer", pa.table({
            "c_custkey": pa.array(range(nc), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(nc)],
            "c_nationkey": pa.array(
                rng.integers(0, 25, nc), pa.int32()
            ),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
            "c_mktsegment": pa.array(
                np.array(SEGMENTS)[rng.integers(0, 5, nc)]
            ),
        }))

    if want("supplier"):
        write(args.out, "supplier", pa.table({
            "s_suppkey": pa.array(range(ns), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
            "s_nationkey": pa.array(
                rng.integers(0, 25, ns), pa.int32()
            ),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, ns), 2),
        }))

    if want("part"):
        adj = np.array(ADJ)[rng.integers(0, 8, npart)]
        noun = np.array(NOUN)[rng.integers(0, 8, npart)]
        keys = np.arange(npart)
        write(args.out, "part", pa.table({
            "p_partkey": pa.array(keys, pa.int64()),
            "p_name": np.char.add(np.char.add(adj, " "), noun),
            "p_brand": np.char.add(
                "Brand#", rng.integers(1, 26, npart).astype(str)
            ),
            "p_type": pa.array(
                np.array(PTYPES)[rng.integers(0, 6, npart)]
            ),
            "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
            "p_retailprice": np.round(900 + (keys % 1000) * 0.1, 1),
        }))

    day = 86400 * US
    if want("orders"):
        od_lo, od_hi = ts_us("1995-01-01"), ts_us("2001-08-01")
        odates = (
            od_lo + rng.integers(0, (od_hi - od_lo) // day + 1, no) * day
        )
        write(args.out, "orders", pa.table({
            "o_orderkey": pa.array(range(no), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
            "o_orderstatus": pa.array(
                np.array(["F", "O", "P"])[rng.integers(0, 3, no)]
            ),
            "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
            "o_orderdate": pa.array(odates, pa.timestamp("us")),
            "o_orderpriority": pa.array(
                np.array(PRIORITIES)[rng.integers(0, 5, no)]
            ),
        }))

    if want("lineitem"):
        sd_lo, sd_hi = ts_us("1995-01-02"), ts_us("2001-11-04")
        write(args.out, "lineitem", pa.table({
            "l_orderkey": pa.array(rng.integers(0, no, nl), pa.int64()),
            "l_partkey": pa.array(
                rng.integers(0, npart, nl), pa.int64()
            ),
            "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
            "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, nl), 2),
            "l_discount": np.round(rng.uniform(0, 0.1, nl), 2),
            "l_tax": np.round(rng.uniform(0, 0.08, nl), 2),
            "l_returnflag": pa.array(
                np.array(["A", "N", "R"])[rng.integers(0, 3, nl)]
            ),
            "l_linestatus": pa.array(
                np.array(["F", "O"])[rng.integers(0, 2, nl)]
            ),
            "l_shipdate": pa.array(
                sd_lo
                + rng.integers(0, (sd_hi - sd_lo) // day + 1, nl) * day,
                pa.timestamp("us"),
            ),
        }))

    if want("events"):
        n_users = max(1, int(15_000 * args.sf))
        e_lo, e_hi = ts_us("2024-01-01"), ts_us("2024-01-31")
        # sorted uniform arrivals: ts increases with event_id, density
        # scales with sf over the FIXED 30-day window (as in the
        # fixtures)
        ets = np.sort(rng.integers(e_lo, e_hi, ne))
        events_tbl = pa.table({
            "event_id": pa.array(range(ne), pa.int64()),
            "ts": pa.array(ets, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, n_users, ne), pa.int64()
            ),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]
            ),
            "value": np.round(rng.exponential(50.0, ne), 2),
            "props": np.char.add(
                np.char.add(
                    '{"k": ', rng.integers(0, 100, ne).astype(str)
                ),
                "}",
            ),
        })
        if args.partition_events:
            # dt = UTC calendar date of ts, the hive partition key.
            # Events are ts-sorted, so each of the ~30 day partitions
            # gets one contiguous file. Vectorized: a Python-level
            # per-row loop is a 100M-iteration crawl at sf100.
            day_us = 86_400 * US
            dt = np.datetime_as_string(
                (ets // day_us).astype("datetime64[D]"), unit="D"
            )
            root = os.path.join(args.out, "events.parquet")
            pq.write_to_dataset(
                events_tbl.append_column("dt", pa.array(dt)),
                root_path=root,
                partition_cols=["dt"],
                compression="zstd",
            )
            print(
                f"  events: {events_tbl.num_rows} rows "
                f"(partitioned dt={dt[0]}..{dt[-1]})"
            )
        else:
            write(args.out, "events", events_tbl)

    nd = n["documents"]
    if nd >= 500_000_000:
        # The corpus fixture plants duplicates at doc_id + 5e8/1e9/1.5e9
        # (fixtures.py CORPUS_SQL contract, raised from 1e5/2e5/3e5 in
        # r5 so sf10's 500k docs — and anything up to sf10,000 — cannot
        # alias plant ids onto real documents). The ceiling is pinned
        # by the pair-packing arithmetic: ids must stay < 2^31 so
        # a*2^32+b fits a signed long (operators/dedup.py
        # pair_counts_from_lists).
        raise SystemExit(
            f"documents={nd} >= 500000000 aliases the corpus plant-id "
            "offsets (fixtures.py CORPUS_SQL) and overflows the packed-"
            "pair longs; raise the offsets and the plans' doc_id "
            "discriminators in lockstep (ids must stay < 2^31)"
        )
    if want("documents"):
        lens = rng.integers(10, 101, nd)
        vocab = np.array(VOCAB)
        flat = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
        texts, pos = [], 0
        for ln in lens:
            texts.append(" ".join(flat[pos:pos + ln]))
            pos += ln
        write(args.out, "documents", pa.table({
            "doc_id": pa.array(range(nd), pa.int64()),
            "text": texts,
            "lang": pa.array(rng.choice(LANGS, nd, p=LANG_P)),
            "source": [f"src{i % 20}" for i in range(nd)],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }))

    if want("embeddings"):
        nv = n["embeddings"]
        vecs = rng.normal(size=(nv, 64)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        write(args.out, "embeddings", pa.table({
            "vec_id": pa.array(range(nv), pa.int64()),
            "embedding": pa.array(
                list(vecs), pa.list_(pa.float32())
            ),
            "label": pa.array(rng.integers(0, 10, nv), pa.int32()),
        }))
    print("done")


if __name__ == "__main__":
    main()
