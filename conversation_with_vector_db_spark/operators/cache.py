"""Scoped caching for intra-query reuse.

Operators cache intermediates that feed multiple consumers in ONE query
plan (e.g. the dedup shingle table feeding sizes + both join sides).
A bare ``.cache()`` never unpersists, so a long-lived session running
many queries accumulates cached RDDs in executor memory. Every operator
cache goes through :func:`scoped_cache` instead; the query registry
releases all previously-scoped caches when the next query starts, and
hosts with their own lifecycle (bench loops, notebooks) may call
:func:`release_all` directly after consuming a result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` registered for later release."""
    cached = df.cache()
    _LIVE.append(cached)
    return cached


def release_all() -> int:
    """Unpersist every scoped cache (non-blocking); returns the count."""
    n = len(_LIVE)
    for df in _LIVE:
        try:
            df.unpersist(False)
        except Exception:
            pass  # session already stopped — nothing to release
    _LIVE.clear()
    return n
