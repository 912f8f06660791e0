"""Physical data-layout operators: bucketing and partition pruning.

The two storage-side levers a 100 TB deployment pulls before any query
tuning (reference analogue: none — the reference reads single PDFs; at
Spark scale layout IS the optimization):

- **Bucketed tables** (`write_bucketed` / `bucketed_join`): pre-hash
  the big fact tables into N buckets on the join key at WRITE time, so
  every subsequent join/aggregation on that key runs with ZERO
  shuffle — the exchange that would move the whole table at query time
  is paid once at ingest. This is the idiomatic Spark answer to
  "co-locate the join" (`DataFrameWriter.bucketBy`), and the plan
  contract in tests/test_physical.py pins the property that matters:
  no ShuffleExchange on either side of the bucketed join.

- **Partitioned layout** (`write_day_partitioned`): directory-level
  partitioning on a derived day column; date-range predicates then
  prune entire directories BEFORE the scan (PartitionFilters in the
  plan, distinct from parquet row-group pushdown). The contract test
  pins both the PartitionFilters line and result equality with the
  unpartitioned filter.

Both writers are idempotent (mode=overwrite) and deterministic; they
are library surfaces (filesystem side effects), exercised by pytest
contracts rather than the DuckDB oracle gate, like the streaming and
runner modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table registered in
    the session catalog (bucket metadata lives in the catalog — plain
    ``.parquet(path)`` cannot carry it). Buckets are hashed on ``key``
    and sorted within, so bucketed joins need neither exchange nor a
    full sort. ``n_buckets`` should be sized so one bucket of the
    LARGEST co-bucketed table fits an executor (e.g. ~100 GB tables →
    1024 buckets ≈ 100 MB each); all join partners must share key AND
    bucket count, or Spark falls back to shuffling the mismatched
    side."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With
    matching bucket specs the physical plan is a SortMergeJoin whose
    both children read pre-bucketed files directly — no
    ShuffleExchange, no shuffle IO, which at 100 TB is the difference
    between touching the network twice per query and never."""
    return spark.table(left).join(spark.table(right), key)


def write_day_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Write with directory partitioning on the derived day of
    ``ts_col``. Day granularity bounds the partition count (vs raw
    timestamp — millions of dirs — or hour at 100 TB/day volumes);
    appending later days never rewrites earlier ones, which is the
    incremental-ingest layout the runner's bucket manifest emulates at
    job level."""
    (
        df.withColumn("day", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def read_day_range(
    spark: SparkSession, path: str, start_day: str, end_day: str
) -> DataFrame:
    """Scan a day-partitioned dataset restricted to [start_day,
    end_day). The day predicate matches the partition column, so
    Catalyst prunes the directories at planning time — the scan's
    PartitionFilters carries the range and unlisted days cost zero
    IO (contract-tested)."""
    return spark.read.parquet(path).filter(
        (F.col("day") >= start_day) & (F.col("day") < end_day)
    )
