"""§2.10 agent tool surface tests (reference services/agent/tools.py
contract: JSON-lines strings, not-found messages, doc scoping)."""

import json

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.agent_tools import (
    get_document,
    list_documents,
    search_chunks,
    search_document_text,
)
from pdf_parser_spark.pipeline import extract_turns, synth_transcripts_df
from pdf_parser_spark.search import doc_vectors

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def extracted(spark):
    return extract_turns(
        synth_transcripts_df(spark, n_convs=6), salt_buckets=4
    ).cache()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _parse_lines(out):
    return [json.loads(line) for line in out.split("\n")]


def test_search_chunks(spark, docs):
    out = search_chunks(doc_vectors(docs), docs, n_results=3)
    rows = _parse_lines(out)
    assert 1 <= len(rows) <= 3
    assert rows[0]["rank"] == 1 and "similarity" in rows[0]


def test_search_chunks_doc_scoped(spark, docs):
    some_id = docs.select("doc_id").first()["doc_id"]
    out = search_chunks(doc_vectors(docs), docs, document_id=some_id, n_results=5)
    if out != "No results found.":
        assert all(r["doc_id"] == some_id for r in _parse_lines(out))


def test_get_document(extracted):
    out = get_document(extracted, conv_id="conv_000002")
    meta = json.loads(out)
    assert meta["document_id"] == "conv_000002"
    assert meta["total_pages"] > 0


def test_get_document_missing(extracted):
    assert "not found" in get_document(extracted, conv_id="conv_999999")


def test_list_documents(extracted):
    rows = _parse_lines(list_documents(extracted, limit=3))
    assert len(rows) == 3
    assert rows[0]["document_id"] == "conv_000000"


def test_list_documents_source_filter(extracted):
    out = list_documents(extracted, source="ocr")
    for r in _parse_lines(out):
        assert r["total_pages"] >= 1


def test_search_document_text(extracted):
    # every synth conv contains vocabulary words; search a common one
    row = extracted.filter(
        F.lower(F.col("extracted_text")).contains("table")
    ).select("conv_id").first()
    out = search_document_text(extracted, conv_id=row["conv_id"], keyword="TABLE")
    rows = _parse_lines(out)
    assert all(r["document_id"] == row["conv_id"] for r in rows)


def test_search_document_text_empty_keyword(extracted):
    assert "required" in search_document_text(extracted, conv_id="conv_000000", keyword="")
