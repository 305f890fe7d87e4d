"""Shared helpers for oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a proper TIMESTAMP.

    The parquet stores TIMESTAMP(NANOS), which Spark lacks; with
    ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as LONG nanos
    and is floor-divided to micros JVM-side (DuckDB's TIMESTAMP_NS→TIMESTAMP
    cast truncates identically).
    """
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        # integer division — double division would lose precision at 1e18 nanos
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return ev


def dsum(expr: str, alias: str, scale: int = 4) -> str:
    """Order-independent floating-point SUM (identical in Spark & DuckDB).

    ``SUM(double)`` is accumulation-order-dependent in the last ulp; Spark's
    partial/final aggregation order differs from DuckDB's scan order, so a raw
    double sum can hash-mismatch.  Casting each addend to DECIMAL makes the sum
    exact and order-free; the final cast back to DOUBLE is deterministic.
    This also reflects the 100 TB stance: decimal partial aggregation is
    map-side combinable, so the plan shape is unchanged.
    """
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,{scale}))) AS DOUBLE) AS {alias}"


def davg(expr: str, alias: str, scale: int = 4) -> str:
    """Order-independent AVG via decimal sum / count."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,{scale}))) AS DOUBLE)"
        f" / COUNT(*) AS DOUBLE) AS {alias}"
    )
