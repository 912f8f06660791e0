"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction job on sf0.001; ``queries`` /
``oracle_sql`` expose the operator surface (SURVEY.md §2) for the
sf0.01 DuckDB correctness gate. Extraction-family queries are not
SQL-expressible (regex/layout kernels) and carry no oracle -> the
driver records rows-only checks for them, per the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark.pipeline import (
    build_chunks,
    conversation_metrics,
    extract_turns,
    fill_turn_gaps,
    run_metrics,
    transcripts_from_documents,
)
from pdf_parser_spark.dataops import DATAOPS_ORACLES, DATAOPS_QUERIES
from pdf_parser_spark.multimodal import MULTIMODAL_QUERIES
from pdf_parser_spark.queries import ORACLES, QUERIES
from pdf_parser_spark.search import SEARCH_ORACLES, SEARCH_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-conversation extraction metrics over transcripts
    wrapped from sf0.001 documents (per-turn kernel + salted
    repartition + stable ordering window)."""
    transcripts = transcripts_from_documents(spark, "/root/testdata/sf0.001", convs=25)
    extracted = extract_turns(transcripts, salt_buckets=16)
    return conversation_metrics(extracted).orderBy("conv_id")


# --- extraction-family queries (rows-only checks: non-SQL kernels) ---


def _q_extracted_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16)
    return extracted.select(
        "conv_id", "turn_idx", "turn_seq", "role", "source", "payload_type",
        "is_fallback", "n_blocks", "n_spans", "n_chars", "extracted_text",
    )


def _q_extraction_conv_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16)
    return conversation_metrics(extracted)


def _q_extraction_run_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16)
    return run_metrics(extracted)


def _q_extraction_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16)
    return build_chunks(extracted)


def _q_extraction_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16)
    # drop every 7th turn, then prove the spine restores it
    holey = extracted.filter(F.col("turn_idx") % 7 != 3)
    filled = fill_turn_gaps(holey)
    return filled.groupBy("conv_id").agg(
        F.count("*").alias("n_turns_filled"),
        F.sum(F.col("is_gap").cast("long")).alias("n_gaps"),
    )


_EXTRACTION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "extract_turns_docs": _q_extracted_turns,
    "extract_conv_metrics": _q_extraction_conv_metrics,
    "extract_run_metrics": _q_extraction_run_metrics,
    "extract_chunks": _q_extraction_chunks,
    "extract_gapfill": _q_extraction_gapfill,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(QUERIES)
    out.update(DATAOPS_QUERIES)
    out.update(SEARCH_QUERIES)
    out.update(MULTIMODAL_QUERIES)  # rows-only: binary decode is a stub
    out.update(_EXTRACTION_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLES)
    out.update(DATAOPS_ORACLES)
    out.update(SEARCH_ORACLES)
    return out
