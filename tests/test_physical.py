"""Plan + equality contracts for the physical-layout module.

These pin the properties that only matter at scale: a bucketed join
must not shuffle, and a day-partition predicate must prune at the
directory level (PartitionFilters), not just at the row-group level
(PushedFilters). Both are asserted on the executed plan text, the same
technique as tests/test_plans.py.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.physical import (
    bucketed_join,
    read_day_range,
    write_bucketed,
    write_day_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables co-bucketed on doc_id join with ZERO exchanges: the
    hash-partitioning paid at write time replaces the query-time
    shuffle. Broadcast is disabled for the test so the plan can't
    sidestep the property; values must equal the plain join."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    metrics = docs.select(
        "doc_id", F.length("text").alias("n_chars2"), "lang"
    )
    write_bucketed(
        docs.select("doc_id", "source"),
        "t_docs_b",
        str(tmp_path / "docs_b"),
        "doc_id",
        n_buckets=4,
    )
    write_bucketed(
        metrics, "t_metrics_b", str(tmp_path / "metrics_b"), "doc_id", n_buckets=4
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "t_docs_b", "t_metrics_b", "doc_id")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        got = joined.toPandas().sort_values("doc_id").reset_index(drop=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
        spark.sql("DROP TABLE IF EXISTS t_metrics_b")
    want = (
        docs.select("doc_id", "source")
        .join(metrics, "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])


def test_bucketed_agg_has_no_shuffle(spark, tmp_path):
    """A groupBy on the bucket key also reuses the write-time
    partitioning — aggregation over a bucketed table is exchange-free
    too (the other half of the pay-once-at-ingest story)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_bucketed(
        docs.select("doc_id", "n_chars"),
        "t_docs_agg_b",
        str(tmp_path / "docs_agg_b"),
        "doc_id",
        n_buckets=4,
    )
    try:
        agg = (
            spark.table("t_docs_agg_b")
            .groupBy("doc_id")
            .agg(F.sum("n_chars").alias("s"))
        )
        plan = _executed_plan(agg)
        assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"
        assert agg.count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_agg_b")


def test_day_partition_pruning(spark, tmp_path):
    """The day-range read must carry the predicate as PartitionFilters
    (directory pruning), read strictly fewer files than the full scan,
    and return exactly the rows the unpartitioned filter returns."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    path = str(tmp_path / "events_by_day")
    write_day_partitioned(events, path)

    start, end = "2024-01-08", "2024-01-15"
    pruned = read_day_range(spark, path, start, end)
    plan = _executed_plan(pruned)
    assert "PartitionFilters" in plan, plan
    # the day predicates live in PartitionFilters, not the data filter
    pf = plan[plan.index("PartitionFilters") :].split("]", 1)[0]
    assert "day" in pf, pf

    got = pruned.drop("day").toPandas()
    want = events.filter(
        (F.date_format("ts", "yyyy-MM-dd") >= start)
        & (F.date_format("ts", "yyyy-MM-dd") < end)
    ).toPandas()
    assert len(got) == len(want) > 0
    assert sorted(got["event_id"]) == sorted(want["event_id"])

    # pruning is physical: the pruned scan touches fewer partitions
    n_all = spark.read.parquet(path).select("day").distinct().count()
    n_pruned = pruned.select("day").distinct().count()
    assert 0 < n_pruned < n_all
