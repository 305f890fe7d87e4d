"""Space-filling-curve data layout (Z-order / Morton clustering).

At 100 TB the dominant read cost is scan pruning: parquet row-group
min/max stats only skip data when the file sort order correlates with the
query predicate.  A single-column sort clusters one dimension perfectly
and scrambles the rest; interleaving the bits of several (rank-bounded)
dimensions into one Morton key gives every dimension partial locality, so
min/max stats prune multi-dimensional predicates — the Delta/Iceberg
OPTIMIZE ZORDER idea, expressed with plain Spark primitives:
``repartitionByRange`` on the key (range partitioner = contiguous curve
segments per output file) + ``sortWithinPartitions`` (row groups within a
file stay curve-ordered).

Everything here is exact integer bit arithmetic in JVM expressions — no
UDF, no shuffle beyond the one range exchange the layout IS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cols: list[Column | str], bits: int = 10) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column, column 0 owning the least-significant lane.

    Inputs must be non-negative integers already reduced to ``bits``
    width (callers bucket/rank first — a raw 64-bit id would alias);
    values are masked defensively.  The expression unrolls to
    ``bits × len(cols)`` shift/mask terms — compile-time constants, fully
    inside whole-stage codegen.
    """
    n = len(cols)
    if not cols:
        raise ValueError("morton_key needs at least one column")
    if bits < 1:
        # bits=0 emits NO shift/mask terms -> a constant-zero key, which
        # silently degrades zorder_repartition to one unsorted partition
        raise ValueError(f"morton_key: bits must be >= 1, got {bits}")
    if bits * n > 63:
        # JVM shiftleft masks the shift amount mod 64: lanes >= 64 would
        # silently alias back onto low bits and collide distinct inputs
        raise ValueError(
            f"bits*len(cols) = {bits * n} exceeds 63: the interleaved key "
            "must fit a signed 64-bit long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    cs = [c.cast("long").bitwiseAND(F.lit((1 << bits) - 1)) for c in cs]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(cs):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)),
                            i * n + d))
    return z


def zorder_repartition(df: DataFrame, cols: list[str], bits: int = 10,
                       num_partitions: int | None = None) -> DataFrame:
    """Cluster ``df`` along the Z-curve of ``cols`` for write-out.

    Range-partitions on the Morton key (each output partition holds one
    contiguous curve segment — partition min/max spans are disjoint,
    pinned by test) and sorts within partitions so parquet row-group
    stats are tight on every constituent column.  The key column is
    dropped before return; layout is a write-time concern, not schema.
    """
    if num_partitions is not None and num_partitions < 1:
        raise ValueError(
            f"zorder_repartition: num_partitions must be >= 1, "
            f"got {num_partitions}")
    key = morton_key([F.col(c) for c in cols], bits=bits).alias("__zkey")
    with_key = df.withColumn("__zkey", key)
    parted = (with_key.repartitionByRange(num_partitions, "__zkey")
              if num_partitions is not None else
              with_key.repartitionByRange("__zkey"))
    return parted.sortWithinPartitions("__zkey").drop("__zkey")
