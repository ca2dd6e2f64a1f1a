#!/usr/bin/env python3
"""Dump physical plans for registered queries (the PLANS.md workflow).

Usage:
    python tools/explain.py <query_name> [--sf-dir DIR] [--executed]

``--executed`` prints the post-AQE executed plan (runs the query via a
noop write first); default prints ``explain('formatted')`` — the
pre-execution plan with pushed filters, read schemas, and join
strategies visible.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--executed", action="store_true")
    args = ap.parse_args()

    from conversation_with_vector_db_spark.plans import load_all, registry
    from conversation_with_vector_db_spark.session import get_spark

    load_all()
    if args.name not in registry.REGISTRY:
        names = ", ".join(sorted(registry.REGISTRY))
        print(f"unknown query {args.name!r}; registered: {names}")
        return 1
    spark = get_spark(app_name="cvdb-explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry.REGISTRY[args.name].fn(spark, args.sf_dir)
    if args.executed:
        # Execute the DataFrame's OWN QueryExecution: a noop write
        # wraps the logical plan in a separate QE, leaving df's
        # executedPlan un-run (it would print `isFinalPlan=false` —
        # the pre-AQE plan, review-verified).
        df.collect()
        print(df._jdf.queryExecution().executedPlan().toString())
    else:
        df.explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
