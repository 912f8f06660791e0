"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction job on sf0.001; ``queries`` /
``oracle_sql`` expose the operator surface (SURVEY.md §2) for the
sf0.01 DuckDB correctness gate. EVERY query carries an oracle.
Extraction kernels are not SQL-expressible, so their oracles are
kernel-generated goldens: scripts/make_goldens.py runs the
straight-line pure-Python kernel (no Spark) over the documents->
transcripts wrap and pins the full per-turn and per-chunk tables to
parquet under tests/golden/; the extraction oracle SQL reads those
files with read_parquet() (directly, or aggregated for metrics/
gapfill). The pinned goldens are for the driver's correctness sf
(0.01).
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
from pdf_parser_spark.multimodal import MULTIMODAL_ORACLES, MULTIMODAL_QUERIES
from pdf_parser_spark.queries import ORACLES, QUERIES
from pdf_parser_spark.search import SEARCH_ORACLES, SEARCH_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-conversation extraction metrics over transcripts
    wrapped from sf0.001 documents (per-turn kernel + salted
    repartition + stable ordering window)."""
    transcripts = transcripts_from_documents(spark, "/root/testdata/sf0.001", convs=25)
    extracted = extract_turns(transcripts, salt_buckets=16)
    return conversation_metrics(extracted).orderBy("conv_id")


# --- extraction-family queries (golden-parquet oracles; see above) ---


def _q_extracted_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16, include_blocks=False)
    return extracted.select(
        "conv_id", "turn_idx", "turn_seq", "role", "source", "payload_type",
        "is_fallback", "n_blocks", "n_spans", "n_chars", "extracted_text",
    )


def _q_extraction_conv_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16, include_blocks=False)
    return conversation_metrics(extracted)


def _q_extraction_run_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16, include_blocks=False)
    return run_metrics(extracted)


def _q_extraction_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16)
    return build_chunks(extracted)


def _q_extraction_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16, include_blocks=False)
    # drop every 7th turn, then prove the spine restores it
    holey = extracted.filter(F.col("turn_idx") % 7 != 3)
    filled = fill_turn_gaps(holey)
    return filled.groupBy("conv_id").agg(
        F.count("*").alias("n_turns_filled"),
        F.sum(F.col("is_gap").cast("long")).alias("n_gaps"),
    )


def _q_extract_text_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-oracle extraction check: per-turn md5 of extracted_text,
    compared against the pinned kernel-generated golden parquet."""
    extracted = extract_turns(
        transcripts_from_documents(spark, sf_dir), salt_buckets=16, include_blocks=False
    )
    return extracted.select(
        "conv_id", "turn_idx", F.md5(F.col("extracted_text")).alias("text_md5")
    )


def _q_extract_spans_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-oracle span-offset check (the north-rule contract is text
    AND span offsets per turn): md5 of the canonical
    "block_id:start:end;..." rendering of the spans array, computed
    JVM-side with transform+concat_ws (no Python UDF), vs the same
    digest pinned by the straight-line kernel in the golden."""
    extracted = extract_turns(
        transcripts_from_documents(spark, sf_dir), salt_buckets=16, include_blocks=False
    )
    span_str = F.transform(
        "spans",
        lambda s: F.concat_ws(
            ":", s["block_id"], s["start"].cast("string"), s["end"].cast("string")
        ),
    )
    return extracted.select(
        "conv_id",
        "turn_idx",
        F.md5(F.concat_ws(";", span_str)).alias("spans_md5"),
    )


def _q_extract_overlay_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-oracle check of the S4 searchable-PDF overlay analogue:
    per-turn count + md5 of the "block_id:line_no:text" rendering of
    export_text_overlay's positioned-text layer, vs the same digest
    pinned from the straight-line kernel (kernels/overlay.py). The
    geometry (bboxes, font sizes) is covered by the kernel-vs-Spark
    equality test; the digest pins route choices and line splitting."""
    from pdf_parser_spark.pipeline import export_text_overlay

    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16)
    ov = export_text_overlay(extracted)
    per_turn = ov.groupBy("conv_id", "turn_idx").agg(
        F.count("*").alias("n_overlay_lines"),
        F.md5(
            F.concat_ws(
                ";",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("line_no", "block_id", "text"))
                    ),
                    lambda s: F.concat_ws(
                        ":", s["block_id"], s["line_no"].cast("string"), s["text"]
                    ),
                ),
            )
        ).alias("overlay_md5"),
    )
    return (
        extracted.select("conv_id", "turn_idx")
        .join(per_turn, ["conv_id", "turn_idx"], "left")
        .select(
            "conv_id",
            "turn_idx",
            F.coalesce(F.col("n_overlay_lines"), F.lit(0)).cast("int").alias("n_overlay_lines"),
            F.coalesce(F.col("overlay_md5"), F.md5(F.lit(""))).alias("overlay_md5"),
        )
    )


def _q_extract_chunks_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-oracle chunker check (K1-K5): per-chunk md5 vs the pinned
    golden."""
    extracted = extract_turns(transcripts_from_documents(spark, sf_dir), salt_buckets=16)
    return build_chunks(extracted).select(
        "chunk_id", F.md5(F.col("text")).alias("text_md5")
    )


_GOLDEN_DIR = "/root/repo/tests/golden"

_EXTRACTION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "extract_turns_docs": _q_extracted_turns,
    "extract_conv_metrics": _q_extraction_conv_metrics,
    "extract_run_metrics": _q_extraction_run_metrics,
    "extract_chunks": _q_extraction_chunks,
    "extract_gapfill": _q_extraction_gapfill,
    "extract_text_md5": _q_extract_text_md5,
    "extract_spans_md5": _q_extract_spans_md5,
    "extract_overlay_md5": _q_extract_overlay_md5,
    "extract_chunks_md5": _q_extract_chunks_md5,
}

# Oracles for the extraction family: the kernel-generated golden
# parquet IS the expected result (pinned at the driver's correctness
# sf by scripts/make_goldens.py — single-process, no Spark). DuckDB
# reads it directly (or aggregates it for the metrics/gapfill
# queries), making every extraction query a hard
# rows+schema+value-hash gate on the distributed pipeline.
_TURNS_GOLDEN = f"read_parquet('{_GOLDEN_DIR}/extract_md5_sf0.01.parquet')"
_CHUNKS_GOLDEN = f"read_parquet('{_GOLDEN_DIR}/chunks_md5_sf0.01.parquet')"

_EXTRACTION_ORACLES: dict[str, str] = {
    "extract_text_md5": f"""
        SELECT conv_id, turn_idx, text_md5 FROM {_TURNS_GOLDEN}
    """,
    "extract_spans_md5": f"""
        SELECT conv_id, turn_idx, spans_md5 FROM {_TURNS_GOLDEN}
    """,
    "extract_overlay_md5": f"""
        SELECT conv_id, turn_idx, n_overlay_lines, overlay_md5 FROM {_TURNS_GOLDEN}
    """,
    "extract_chunks_md5": f"""
        SELECT chunk_id, text_md5 FROM {_CHUNKS_GOLDEN}
    """,
    "extract_turns_docs": f"""
        SELECT conv_id, turn_idx, turn_seq, role, source, payload_type,
               is_fallback, n_blocks, n_spans, n_chars, extracted_text
        FROM {_TURNS_GOLDEN}
    """,
    "extract_conv_metrics": f"""
        SELECT conv_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(sum(n_blocks) AS BIGINT) AS total_blocks,
               CAST(sum(n_tables) AS BIGINT) AS total_tables,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(n_spans) AS BIGINT) AS total_spans,
               avg(CASE WHEN is_fallback THEN 1.0 ELSE 0.0 END) AS ocr_fallback_rate,
               min(turn_idx) AS first_turn,
               max(turn_idx) AS last_turn
        FROM {_TURNS_GOLDEN} GROUP BY conv_id
    """,
    "extract_run_metrics": f"""
        SELECT CAST(count(*) AS BIGINT) AS turns_parsed,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS conversations,
               CAST(sum(n_blocks) AS BIGINT) AS blocks_emitted,
               CAST(sum(n_spans) AS BIGINT) AS spans_emitted,
               CAST(sum(n_chars) AS BIGINT) AS chars_extracted,
               avg(CASE WHEN is_fallback THEN 1.0 ELSE 0.0 END) AS ocr_fallback_rate
        FROM {_TURNS_GOLDEN}
    """,
    "extract_chunks": f"""
        SELECT chunk_id, document_id, source_file, page_number,
               block_id, block_type, text, confidence
        FROM {_CHUNKS_GOLDEN}
    """,
    # the gapfill query drops turn_idx % 7 == 3 then restores the spine:
    # surviving max turn m -> m+1 filled rows, of which the gaps are the
    # i in [0, m] with i % 7 == 3, i.e. (m-3)//7 + 1 for m >= 3
    "extract_gapfill": f"""
        WITH holey AS (
            SELECT conv_id, turn_idx FROM {_TURNS_GOLDEN} WHERE turn_idx % 7 <> 3
        ), mx AS (
            SELECT conv_id, max(turn_idx) AS m FROM holey GROUP BY conv_id
        )
        SELECT conv_id,
               CAST(m + 1 AS BIGINT) AS n_turns_filled,
               CAST(CASE WHEN m >= 3 THEN (m - 3) // 7 + 1 ELSE 0 END AS BIGINT) AS n_gaps
        FROM mx
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(QUERIES)
    out.update(DATAOPS_QUERIES)
    out.update(SEARCH_QUERIES)
    out.update(MULTIMODAL_QUERIES)  # stub decode is deterministic -> oracle-checked
    out.update(_EXTRACTION_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLES)
    out.update(DATAOPS_ORACLES)
    out.update(SEARCH_ORACLES)
    out.update(MULTIMODAL_ORACLES)
    out.update(_EXTRACTION_ORACLES)
    return out
