"""Query plans: the engine's named-query registry.

Each module in this package declares queries with the
:func:`.registry.query` decorator; importing the package populates the
registry the driver contract (``__spark_entry__.py``) exposes.
"""

from __future__ import annotations

from . import registry


def load_all() -> None:
    """Import every plan module (idempotent) so the registry is full."""
    from . import (  # noqa: F401
        analytics,
        ann,
        dedup,
        joins,
        maintenance,
        multimodal,
        relational,
        retrieval,
        scale,
        streaming_batch,
        text_pipeline,
        udf_sql,
        vector,
    )


__all__ = ["registry", "load_all"]
