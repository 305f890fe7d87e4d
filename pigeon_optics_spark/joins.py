"""Skew-mitigation join/aggregation strategies.

AQE (enabled session-wide, session.py) already handles moderate skew: it
splits oversized shuffle partitions at runtime and replicates the matching
side of a sort-merge join (OptimizeSkewedJoin).  These helpers are for the
cases AQE cannot fix by splitting partitions:

- a single pathological KEY whose group must be spread across executors
  *before* the shuffle (``salted_join``);
- exact ``countDistinct`` over a skewed group key, where the dedup hash set
  for the hot key lives on one reducer (``skew_safe_count_distinct``).

Both rewrites are result-identical to the naive plan — tests pin that — so
they are safe to apply mechanically when a job's stage timeline shows one
straggler task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_po_salt"


def salted_join(left: DataFrame, right: DataFrame, on: list[str],
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``salt``
    sub-keys and the right side replicated ``salt`` times.

    The left (big, skewed) side gets a per-row salt from
    ``monotonically_increasing_id() % salt`` — row-position based, so it
    spreads UNCONDITIONALLY, including the common case where the hot
    key's rows are byte-identical duplicates (a content hash would give
    them all the same salt and recreate the straggler; it would also
    crash on MapType columns, which Spark refuses to hash).  The right
    side is exploded against the full salt range, so every (key, salt)
    bucket of the left finds its match.  The shuffle then distributes a
    hot key over ``salt`` reducers instead of one.  Cost: the right
    side's shuffle volume × ``salt`` — use it when the right side is far
    smaller than the hot key's row count but too big (or growing) to
    broadcast.  (The salt is not run-stable across executions — fine for
    an execution-strategy knob: the JOIN RESULT is identical either way,
    which is what the tests pin.)

    Only ``inner`` and ``left`` joins are supported: for right/full outer
    joins the replicated right rows would surface as ``salt`` copies of
    each unmatched row.

    Result-identical to ``left.join(right, on, how)`` (pinned by
    tests/test_joins.py); the plan differs only in the added salt key.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, not {how!r}")
    l_salted = left.withColumn(
        SALT_COL,
        F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    r_salted = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return (l_salted.join(r_salted, on + [SALT_COL], how)
            .drop(SALT_COL))


def skew_safe_count_distinct(df: DataFrame, key: str, value: str,
                             out: str = "n_distinct") -> DataFrame:
    """Exact distinct count per key without a per-key dedup hot spot.

    ``groupBy(key).agg(countDistinct(value))`` shuffles every row of a hot
    key to one reducer, which must hold that key's whole distinct set.
    The rewrite shuffles on (key, value) FIRST — the hot key's rows spread
    over reducers by value — then counts the surviving pairs per key, a
    plain map-side-combinable count.  The shuffles are all skew-free; the
    pair one carries only distinct pairs.  NULL handling matches
    ``countDistinct`` exactly: NULL values are filtered before the
    distinct (they would otherwise survive it and count as one), and a
    separate distinct-keys frame left-joins the counts back so a key
    whose values are ALL NULL still appears with 0, as it does in the
    naive aggregation.

    Result-identical to the naive aggregation (pinned by
    tests/test_joins.py, including both NULL cases).
    """
    counts = (df.select(key, value)
              .where(F.col(value).isNotNull())
              .distinct()
              .groupBy(key).agg(F.count("*").alias(out)))
    keys = df.select(key).distinct()
    return (keys.join(counts, key, "left")
            .select(key, F.coalesce(F.col(out), F.lit(0)).alias(out)))
