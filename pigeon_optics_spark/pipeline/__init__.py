"""LLM-training-data pipeline operators (beyond-reference surface,
BASELINE.json north_star): deduplication, similarity search, text analysis,
multimodal column plumbing.

Design rule: everything that can be a built-in Spark SQL expression IS one —
whole-stage-codegen'd, Arrow-free, and bit-reproducible against the DuckDB
oracle.  Python UDFs appear only where semantics genuinely need them
(multimodal decode stubs).
"""

from pyspark.sql import Column


def hash_bucket(col: Column, digits: int = 8) -> Column:
    """Deterministic md5-derived integer in [0, 16**digits): the bucketing
    primitive behind sampling thresholds, split assignment, and shard
    routing.  ``digits <= 15`` keeps the value inside a LONG (16^15 =
    2^60) with no overflow; md5 (not Spark ``hash``) so a DuckDB oracle
    reproduces it bit-for-bit.

    NOTE: the sampling/split/LSH call sites across pipeline/ predate this
    helper and keep their oracle-paired inline forms (each pinned by a
    green driver row); new code should use this one audited version.
    """
    from pyspark.sql import functions as F

    if not 1 <= digits <= 15:
        raise ValueError("digits must be in 1..15 (LONG-safe)")
    return F.conv(F.substring(F.md5(col.cast("string")), 1, digits),
                  16, 10).cast("long")
