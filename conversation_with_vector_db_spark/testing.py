"""Oracle-comparison utilities shared by tests and tools/check_parity.

Mimics the driver's correctness gate: run a registered query on Spark
and its oracle SQL on DuckDB, compare row count, column-name sets, and
values order-insensitively (columns sorted by name, rows sorted) with
float tolerance.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math


def normalize(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        # Keep the int (exactness marker): both engines compute BIGINTs
        # exactly, and coercing to float would let rel_tol swallow real
        # integer mismatches once values pass ~1e7 (1e7 * 1e-7 = 1).
        return ("n", v)
    if isinstance(v, float):
        return ("n", v)
    if isinstance(v, decimal.Decimal):
        # A DECIMAL column would otherwise fall to the generic str()
        # branch, where scale differences (Decimal('1.50') vs
        # Decimal('1.5')) — or one engine widening to double — fail
        # spuriously. Compare as tolerant numerics like any float.
        return ("n", float(v))
    if isinstance(v, dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("t", v.isoformat())
    if isinstance(v, (bytes, bytearray, memoryview)):
        # Spark collects BinaryType as bytearray, DuckDB returns bytes —
        # compare the byte content, not the container repr.
        return ("y", bytes(v))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(normalize(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, normalize(x)) for k, x in v.items())))
    if v is None:
        return ("z",)
    return ("s", str(v))


def values_equal(a, b) -> bool:
    if a[0] != b[0]:
        return False
    if a[0] == "n":
        x, y = a[1], b[1]
        # int vs int: exact. Mixed int/float (one engine widened — e.g.
        # DuckDB sum() of integers vs a Spark double expression) and
        # float/float keep the tolerance.
        if isinstance(x, int) and isinstance(y, int):
            return x == y
        x, y = float(x), float(y)
        if math.isnan(x) and math.isnan(y):
            return True
        return math.isclose(x, y, rel_tol=1e-7, abs_tol=1e-9)
    if a[0] == "l":
        return len(a[1]) == len(b[1]) and all(
            values_equal(x, y) for x, y in zip(a[1], b[1])
        )
    if a[0] == "m":
        # Map values carry floats too: exact a == b here would demand
        # bit-identical doubles inside maps while the scalar path is
        # tolerant. Keys stay exact; values recurse.
        return [k for k, _ in a[1]] == [k for k, _ in b[1]] and all(
            values_equal(x, y)
            for (_, x), (_, y) in zip(a[1], b[1])
        )
    return a == b


def _cell_key(v):
    # Numerics sort NUMERICALLY: sorting repr() strings paired 5.0
    # against 10.0 across engines whenever tolerance-equal floats
    # straddle a digit-count boundary ("10.0" < "5.0" lexically), so
    # the row pairing misaligned before values_equal ever ran. The key
    # is (tag, (nan?, number), structural) — cross-tag comparisons
    # short-circuit on the tag, so the heterogeneous third slot never
    # faces a different type at the same position.
    tag = v[0]
    if tag == "n":
        x = float(v[1])
        if math.isnan(x):
            return (tag, (1, 0.0), "")
        # Keep exact ints in the key slot: collapsing BIGINTs >= 2^53
        # to float aliases distinct values onto one double, letting
        # cross-engine tie order pair them differently and fail the
        # exact int==int check downstream. Python tuple comparison
        # handles mixed int/float numerically.
        return (tag, (0, v[1] if isinstance(v[1], int) else x), "")
    if tag == "l":
        return (tag, (0, 0.0), tuple(_cell_key(x) for x in v[1]))
    if tag == "m":
        return (
            tag,
            (0, 0.0),
            tuple((k, _cell_key(x)) for k, x in v[1]),
        )
    return (tag, (0, 0.0), repr(v[1:]))


def _sort_key(row):
    # Type-insensitive pairing key: an int on one engine and the
    # equal float on the other must sort identically or the row
    # pairing misaligns before values_equal ever runs.
    return tuple(_cell_key(v) for v in row)


def rows_match(spark_rows, duck_rows) -> tuple[bool, str]:
    if len(spark_rows) != len(duck_rows):
        return False, f"row count {len(spark_rows)} vs {len(duck_rows)}"
    key = _sort_key
    s = sorted(spark_rows, key=key)
    d = sorted(duck_rows, key=key)
    for i, (sr, dr) in enumerate(zip(s, d)):
        for j, (a, b) in enumerate(zip(sr, dr)):
            if not values_equal(a, b):
                return False, f"row {i} col {j}: {a!r} vs {b!r}"
    return True, ""


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = [c.lower() for c in df.columns]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(normalize(row[i]) for i in idx) for row in df.collect()]
    return sorted(cols), rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0].lower() for d in cur.description]
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(normalize(row[i]) for i in idx) for row in cur.fetchall()]
    return sorted(cols), rows


def assert_parity(spark, duck, name: str, sf_dir: str) -> int:
    """Assert a registered query matches its oracle; returns row count."""
    from .plans import load_all, registry

    load_all()
    q = registry.REGISTRY[name]
    scols, srows = spark_result(q.fn(spark, sf_dir))
    if q.oracle_sql is None:
        return len(srows)
    dcols, drows = duck_result(duck, q.oracle_sql)
    assert scols == dcols, f"{name}: columns {scols} vs {dcols}"
    ok, why = rows_match(srows, drows)
    assert ok, f"{name}: {why}"
    return len(srows)
