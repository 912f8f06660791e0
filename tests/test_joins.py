"""asof_join edge semantics: inclusive ts ties, no-prior-row NULLs,
carry across multiple left rows."""

import datetime as dt

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
