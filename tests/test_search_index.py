"""S6 vector-store sink tests: the persisted search index must return
the identical ranking as the on-the-fly pipeline (reference:
services/search/chroma_store.py:60-98 add_chunks persists the
collection; :100-145 query runs against it)."""

import pytest

from pdf_parser_spark.search import (
    DEFAULT_QUERY,
    EMBED_DIM,
    load_search_index,
    q_semantic_search,
    search_index,
    write_search_index,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("searchidx") / "index")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_search_index(docs, out)
    return out


def _rows(df):
    return [(r["rank"], r["doc_id"], r["similarity"]) for r in df.collect()]


def test_index_schema(spark, index_dir):
    idx = load_search_index(spark, index_dir)
    assert {"doc_id", "text", *{f"v{d}" for d in range(EMBED_DIM)}} <= set(idx.columns)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert idx.count() == docs.count()


def test_index_search_matches_on_the_fly(spark, index_dir):
    # q_semantic_search now emits both paths tagged; the direct-path
    # ranking must equal a query against THIS module's persisted index
    both = q_semantic_search(spark, SF_DIR)
    live = _rows(both.filter(both["path"] == "direct"))
    gate_indexed = _rows(both.filter(both["path"] == "index"))
    indexed = _rows(search_index(spark, index_dir, DEFAULT_QUERY))
    assert indexed == live
    assert gate_indexed == live
    assert len(indexed) > 0


def test_index_search_other_query(spark, index_dir):
    out = _rows(search_index(spark, index_dir, "golden fixture oracle", topk=5))
    assert len(out) <= 5
    assert [r[0] for r in out] == list(range(1, len(out) + 1))
