"""Scoped caching for intra-query reuse.

Operators cache intermediates that feed multiple consumers in ONE query
plan (e.g. the dedup shingle table feeding sizes + both join sides).
A bare ``.cache()`` never unpersists, so a long-lived session running
many queries accumulates cached RDDs in executor memory. Every operator
cache goes through :func:`scoped_cache`; the query registry advances a
generation when the next query starts and caches older than the
PREVIOUS generation are released.

Keeping exactly one extra generation is deliberate: Spark's cache
manager matches by logical plan, so consecutive queries over the same
derived table (minhash then jaccard over one shingle index) silently
share the previous query's cache — releasing it immediately would
recompute work the session just did, while two generations still bound
executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[tuple[int, DataFrame]] = []
_GEN = 0


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` registered for generational release.

    Registration dedupes by CANONICAL PLAN (``sameResult``): Spark's
    cache manager shares one InMemoryRelation between equivalent plans,
    so two generation entries for the same plan would be one underlying
    cache — and the older entry's delayed unpersist would silently kill
    the data the newer entry still relies on (observed: every bench
    run rebuilt the shingle index its predecessor had just cached).
    An equivalent live plan just has its generation refreshed.
    """
    cached = df.cache()
    try:
        target = cached._jdf.queryExecution().analyzed()
        for i, (gen, old) in enumerate(_LIVE):
            if old._jdf.queryExecution().analyzed().sameResult(target):
                _LIVE[i] = (_GEN, old)
                return cached
    except Exception:
        pass  # canonical comparison unavailable — fall back to append
    _LIVE.append((_GEN, cached))
    return cached


def next_generation() -> int:
    """Advance the generation; release caches two or more generations
    old (the previous generation survives for plan-identity reuse).
    Returns the number released."""
    global _GEN
    _GEN += 1
    keep, drop = [], []
    for gen, df in _LIVE:
        (keep if gen >= _GEN - 1 else drop).append((gen, df))
    for _, df in drop:
        try:
            df.unpersist(False)
        except Exception:
            pass  # session already stopped — nothing to release
    _LIVE[:] = keep
    return len(drop)


def release_all() -> int:
    """Unpersist every scoped cache (non-blocking); returns the count."""
    n = len(_LIVE)
    for _, df in _LIVE:
        try:
            df.unpersist(False)
        except Exception:
            pass
    _LIVE.clear()
    return n
