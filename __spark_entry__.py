"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
  beyond-reference pipeline operators), one callable per name.
``oracle_sql()`` — matching DuckDB SQL for the sf0.01 correctness gate;
  omitted for genuinely non-SQL-expressible ops (driver then does a
  rows-only check).

The real registry lives in ``pigeon_optics_spark/queries/``; each submodule
registers ``(name, spark_fn, oracle_sql|None)`` tuples.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pigeon_optics_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pigeon_optics_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in all_queries().items()
        if oracle is not None
    }
