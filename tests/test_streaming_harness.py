"""The shared streaming-gate harness (queries/_streaming_util.py) proven
end-to-end: forced multi-batch replay with keyed state continuation, the
doubled-source dedup fixture, and the collapse guard failing loudly on a
degenerate run.  New streaming gates build on these; the 22 pre-r6 gates
keep their pinned inline scaffolds."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pigeon_optics_spark.queries._streaming_util import (
    doubled_source,
    read_file_stream,
    run_to_memory,
    scoped_shuffle_partitions,
    sliced_source,
)


@pytest.fixture(scope="module")
def rows_df(spark):
    # 8 users x 40 rows with strictly increasing seq — deterministic
    return spark.range(320).select(
        (F.col("id") % 8).alias("user_id"),
        F.col("id").alias("seq"),
        (F.col("id") * 7 % 101).alias("value"))


def test_sliced_source_forces_ordered_batches_with_state(spark, rows_df):
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = sliced_source(rows_df, F.col("seq"), n_slices=4)
    files = [f for f in __import__("os").listdir(src)
             if f.endswith(".parquet")]
    assert len(files) == 4

    def fold(key, pdfs, state: GroupState):
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n]})

    with scoped_shuffle_partitions(spark, 4):
        stream = (read_file_stream(spark, src)
                  .groupBy("user_id")
                  .applyInPandasWithState(
                      fold, outputStructType="user_id long, n long",
                      stateStructType="n long", outputMode="update",
                      timeoutConf=GroupStateTimeout.NoTimeout))
        name, q = run_to_memory(stream, prefix="po_harness_state",
                                output_mode="update", min_data_batches=4)
    # update-mode emissions: max n per user is the final state; state
    # continued across all four batches => every user counts all 40 rows
    final = {r["user_id"]: r["mx"] for r in
             spark.table(name).groupBy("user_id")
             .agg(F.max("n").alias("mx")).collect()}
    assert final == {u: 40 for u in range(8)}
    # and at least one intermediate emission proves mid-stream state
    # (a single-batch run would only ever emit n == 40)
    mids = spark.table(name).where(F.col("n") < 40).count()
    assert mids > 0


def test_doubled_source_dedup(spark, rows_df):
    src = doubled_source(rows_df.select("user_id", "seq"))
    with scoped_shuffle_partitions(spark, 4):
        stream = read_file_stream(spark, src).dropDuplicates(["seq"])
        name, _ = run_to_memory(stream, prefix="po_harness_dedup",
                                output_mode="append", min_data_batches=2)
    assert spark.table(name).count() == 320  # 640 delivered, 320 distinct


def test_collapse_guard_fails_loudly(spark, rows_df):
    src = sliced_source(rows_df, F.col("seq"), n_slices=4)
    with scoped_shuffle_partitions(spark, 4):
        # read ALL files per trigger -> one data batch -> the guard must
        # raise, never green a degenerate run
        stream = read_file_stream(spark, src, files_per_trigger=4) \
            .select("user_id", "seq")
        with pytest.raises(AssertionError, match="collapsed"):
            run_to_memory(stream, prefix="po_harness_collapse",
                          output_mode="append", min_data_batches=4)


def test_sliced_source_cache_key_reuses_dir(spark, rows_df):
    a = sliced_source(rows_df, F.col("seq"), cache_key=("t", 1))
    b = sliced_source(rows_df, F.col("seq"), cache_key=("t", 1))
    assert a == b
