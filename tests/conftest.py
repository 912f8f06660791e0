"""Shared Spark session for tests (one JVM for the whole run)."""

import pytest

from pdf_parser_spark.pipeline import get_spark


@pytest.fixture(scope="session")
def spark():
    session = get_spark("pdf_parser_spark-tests", master="local[4]", shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
