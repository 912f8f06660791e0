"""asof_join edge semantics: inclusive ts ties, no-prior-row NULLs,
carry across multiple left rows."""

import datetime as dt

from pyspark.sql import functions as F

import pytest
from pyspark.sql import types as T

from pdf_parser_spark.joins import asof_join

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("val", T.LongType()),
    ]
)


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def joined(spark):
    left = spark.createDataFrame(
        [("a", _ts(1), 10), ("a", _ts(5), 20), ("a", _ts(9), 30), ("b", _ts(4), 40)],
        SCHEMA,
    )
    right = spark.createDataFrame(
        [("a", _ts(2), 100), ("a", _ts(5), 200), ("c", _ts(1), 900)], SCHEMA
    )
    rows = asof_join(left, right, on="k", ts="ts").collect()
    return {(r["k"], r["ts"]): r for r in rows}


def test_no_prior_row_is_null(joined):
    r = joined[("a", _ts(1))]
    assert r["prior_val"] is None and r["prior_ts"] is None
    # key with no right rows at all
    r = joined[("b", _ts(4))]
    assert r["prior_val"] is None


def test_tie_is_inclusive(joined):
    # left ts == right ts -> that right row matches (ASOF <= semantics)
    assert joined[("a", _ts(5))]["prior_val"] == 200


def test_latest_prior_wins(joined):
    assert joined[("a", _ts(9))]["prior_val"] == 200
    assert joined[("a", _ts(9))]["prior_ts"] == _ts(5)


def test_left_rows_preserved(joined):
    assert len(joined) == 4


def test_bucketed_range_join_boundaries(spark):
    """[start, end) semantics survive the bucketing rewrite, including
    intervals spanning bucket boundaries."""
    from pdf_parser_spark.joins import bucketed_range_join

    points = spark.createDataFrame(
        [
            ("a", _ts(0), 1),     # == start -> in
            ("a", _ts(30), 2),    # inside -> in
            ("b", _ts(30), 3),    # other key -> out
        ],
        SCHEMA,
    ).withColumnRenamed("val", "pid")
    intervals = spark.createDataFrame(
        [("a", _ts(0), 7)], SCHEMA
    ).select(
        "k",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 40 SECONDS")).alias("end_ts"),
        F.col("val").alias("iid"),
    )
    # tiny buckets force the interval to span several buckets
    out = bucketed_range_join(
        points, intervals, on="k", bucket_seconds=10
    ).collect()
    got = {(r["k"], r["pid"]) for r in out}
    assert got == {("a", 1), ("a", 2)}
    # end-exclusive: a point exactly at end_ts must not match
    edge = spark.createDataFrame([("a", _ts(40), 9)], SCHEMA).withColumnRenamed("val", "pid")
    assert bucketed_range_join(edge, intervals, on="k", bucket_seconds=10).count() == 0
