"""Query registry backing ``__spark_entry__.py``.

Each submodule exposes ``QUERIES: dict[str, tuple[fn, oracle_sql | None]]``
where ``fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the equivalent
ANSI SQL the driver runs in DuckDB over the same parquet (views: region nation
customer supplier part orders lineitem events documents embeddings).  Column
names are aliased identically on both sides — the driver's value-hash compares
columns sorted by name.

Determinism contract for oracle-checked queries (see ``_util.py``):
floating-point SUMs go through a DECIMAL cast so the result is independent of
accumulation order (Spark partial aggs vs DuckDB's ordering would otherwise
drift in the last ulp).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, Optional[str]]] = {}


def register(name: str, fn: QueryFn, oracle: Optional[str]) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name}")
    _REGISTRY[name] = (fn, oracle)


def all_queries() -> dict[str, tuple[QueryFn, Optional[str]]]:
    # import side-effect registration
    from . import relational  # noqa: F401

    try:
        from . import lens_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from . import pipeline_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from . import events_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from . import store_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from . import codec_queries  # noqa: F401
    except ImportError:
        pass
    return dict(_REGISTRY)
