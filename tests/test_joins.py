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


# ---------------------------------------------------------------------------
# bloom_semi_join: exactness under heavy false positives, saturation
# no-op, and the no-false-negative guarantee.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bloom_sides(spark):
    left = spark.createDataFrame(
        [(i, f"row{i}") for i in range(200)], "k LONG, payload STRING"
    )
    right = spark.createDataFrame(
        [(i * 7,) for i in range(20)], "rk LONG"  # keys 0,7,...,133
    )
    return left, right


def _bloom_vs_exact(left, right, **kw):
    from pdf_parser_spark.joins import bloom_semi_join

    exact = left.join(right, left["k"] == right["rk"], "left_semi")
    bloom = bloom_semi_join(left, right, "k", "rk", **kw)
    extra = bloom.exceptAll(exact).count()
    missing = exact.exceptAll(bloom).count()
    return exact.count(), bloom.count(), extra, missing


def test_bloom_semi_join_matches_exact(bloom_sides):
    n_exact, n_bloom, extra, missing = _bloom_vs_exact(*bloom_sides)
    assert n_exact == 20
    assert (n_bloom, extra, missing) == (20, 0, 0)


def test_bloom_semi_join_exact_even_when_saturated(bloom_sides):
    # 16 bits for 20 keys: nearly every probe collides; the exact stage
    # must still strip all false positives (and FNs are impossible).
    n_exact, n_bloom, extra, missing = _bloom_vs_exact(
        *bloom_sides, n_bits=16, n_hashes=2
    )
    assert (n_bloom, extra, missing) == (n_exact, 0, 0)


def test_bloom_prefilter_actually_prunes(bloom_sides):
    # With a well-sized bitmap the prefilter alone (before the exact
    # stage) keeps all 20 true matches (no false negatives) and rejects
    # most of the 180 non-matching left keys (few false positives).
    from pdf_parser_spark.joins import bloom_prefilter

    left, right = bloom_sides
    cand = bloom_prefilter(left, right, "k", "rk", n_bits=1 << 13)
    n_cand = cand.count()
    assert 20 <= n_cand <= 20 + 18  # <=10% of the 180 non-matches leak


def test_bloom_prefilter_no_false_negatives_when_saturated(bloom_sides):
    from pdf_parser_spark.joins import bloom_prefilter

    left, right = bloom_sides
    exact = left.join(right, left["k"] == right["rk"], "left_semi")
    cand = bloom_prefilter(left, right, "k", "rk", n_bits=16)
    assert exact.exceptAll(cand.select(*exact.columns)).count() == 0
