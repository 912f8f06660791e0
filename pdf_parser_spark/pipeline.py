"""The Spark extraction pipeline (M1 in SURVEY.md §7).

Flow (north rule): read transcripts -> explicit salted repartition ->
one ``mapInPandas`` hot stage running the per-turn kernel (classify +
tokenize + layout + postprocess, all Arrow-batched, zero per-row
Python UDFs) -> window over (conv_id, turn_idx) for stable turn
ordering -> parquet/metrics sinks.

Scale design notes
------------------
- The hot stage is a NARROW map over Arrow record batches: one shuffle
  in front (the salted repartition that spreads million-turn
  conversations across tasks) and one behind (the conv_id window for
  stable ordering). Nothing else shuffles.
- Salting is safe because extraction is per-turn; the ordering window
  is salt-agnostic (reference analogue: ordered merge + gap fill,
  src/pipeline.py:833-845).
- Cheap columns (payload_type could be computed in SQL) are NOT split
  out of the kernel: Catalyst cannot reorder filters through opaque
  UDFs (SURVEY.md §4), and splitting would serialize the batch twice.
  The kernel is one Arrow pass.
"""

from __future__ import annotations

import os
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kernels.chunker import build_chunks_for_turn
from .kernels.extract import extract_turn
from .payload import synth_transcripts

DEFAULT_SALT_BUCKETS = 64

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

BLOCK_TYPE = T.StructType(
    [
        T.StructField("block_id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("bbox", T.ArrayType(T.DoubleType()), False),
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType())), True),
        T.StructField(
            "lines",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("text", T.StringType(), False),
                        T.StructField("bbox", T.ArrayType(T.DoubleType()), False),
                    ]
                )
            ),
            True,
        ),
    ]
)

SPAN_TYPE = T.StructType(
    [
        T.StructField("block_id", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("source", T.StringType(), False),
        T.StructField("payload_type", T.StringType(), False),
        T.StructField("is_fallback", T.BooleanType(), False),
        T.StructField("blocks", T.ArrayType(BLOCK_TYPE), False),
        T.StructField("extracted_text", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), False),
        T.StructField("n_blocks", T.IntegerType(), False),
        T.StructField("n_spans", T.IntegerType(), False),
        T.StructField("n_chars", T.IntegerType(), False),
    ]
)

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("document_id", T.StringType(), False),
        T.StructField("source_file", T.StringType(), True),
        T.StructField("page_number", T.IntegerType(), False),
        T.StructField("block_id", T.StringType(), False),
        T.StructField("block_type", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("confidence", T.DoubleType(), False),
    ]
)


def get_spark(
    app_name: str = "pdf_parser_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Session tuned per the survey: AQE on, Arrow on, UTC, shuffle
    partitions ~ cores (not the 200 default)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def synth_transcripts_df(
    spark: SparkSession,
    n_convs: int = 20,
    seed: int = 42,
    heavy_every: int = 50,
    heavy_factor: int = 40,
) -> DataFrame:
    """Deterministic seeded transcripts as a DataFrame (FIXTURES.md §1)."""
    rows = synth_transcripts(n_convs, seed, heavy_every, heavy_factor)
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)


def transcripts_from_documents(spark: SparkSession, sf_dir: str, convs: int = 50) -> DataFrame:
    """Adapter for the driver-contract tables: wrap ``documents.parquet``
    rows into transcript shape (conv = doc_id mod ``convs``, payload =
    document text -> 'ocr' flavor). Lets every extraction query run on
    the provided read-only testdata without synthesizing files."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("conv_id").orderBy("doc_id")
    return (
        docs.select(
            F.concat(F.lit("conv_"), F.lpad((F.col("doc_id") % convs).cast("string"), 6, "0")).alias("conv_id"),
            F.col("doc_id"),
            F.col("text"),
        )
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .select(
            "conv_id",
            "turn_idx",
            F.element_at(F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")), (F.col("turn_idx") % 3) + 1).alias("role"),
            F.col("text"),
            F.lit("").alias("tool"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
        )
    )


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one out. All Python work
    happens here, vectorized per batch (no per-row Spark UDF calls)."""
    cols = [f.name for f in EXTRACTED_SCHEMA.fields]
    for pdf in batches:
        out: dict[str, list[Any]] = {c: [] for c in cols}
        for conv_id, turn_idx, role, text, tool in zip(
            pdf["conv_id"], pdf["turn_idx"], pdf["role"], pdf["text"], pdf["tool"]
        ):
            res = extract_turn(text, int(turn_idx), tool)
            out["conv_id"].append(conv_id)
            out["turn_idx"].append(int(turn_idx))
            out["role"].append(role)
            out["source"].append(res["source"])
            out["payload_type"].append(res["payload_type"])
            out["is_fallback"].append(res["is_fallback"])
            out["blocks"].append(res["blocks"])
            out["extracted_text"].append(res["extracted_text"])
            out["spans"].append(res["spans"])
            out["n_blocks"].append(len(res["blocks"]))
            out["n_spans"].append(len(res["spans"]))
            out["n_chars"].append(len(res["extracted_text"]))
        yield pd.DataFrame(out, columns=cols)


def extract_turns(
    transcripts: DataFrame,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    partitions: int | None = None,
) -> DataFrame:
    """The hot path. Explicit salted repartition (north rule) so a
    single million-turn conversation spreads across ``salt_buckets``
    tasks, then ONE Arrow-batched kernel stage, then the stable-order
    window (the only other shuffle)."""
    if partitions is None:
        partitions = int(
            transcripts.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    salted = transcripts.repartition(
        partitions, F.col("conv_id"), F.pmod(F.hash(F.col("turn_idx")), F.lit(salt_buckets))
    )
    extracted = salted.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)
    order_w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return extracted.withColumn("turn_seq", F.row_number().over(order_w).cast("int"))


def fill_turn_gaps(extracted: DataFrame) -> DataFrame:
    """R11 ordered merge with gap fill — reference: src/pipeline.py:841-845
    appends an empty Page for every missing page number. Spark version:
    left join against a generated turn spine per conversation."""
    spine = (
        extracted.groupBy("conv_id")
        .agg(F.max("turn_idx").alias("max_turn"))
        .select("conv_id", F.explode(F.sequence(F.lit(0), F.col("max_turn"))).alias("turn_idx"))
    )
    return (
        spine.join(extracted, ["conv_id", "turn_idx"], "left")
        .withColumn("extracted_text", F.coalesce("extracted_text", F.lit("")))
        .withColumn("is_gap", F.col("source").isNull())
        .withColumn("source", F.coalesce("source", F.lit("ocr")))
        .withColumn("n_blocks", F.coalesce("n_blocks", F.lit(0)))
    )


def _plain_block(b: Any) -> dict[str, Any]:
    """Arrow hands nested structs back as Row/dict with numpy arrays —
    normalize to the plain-Python shape the kernels expect."""
    d = b if isinstance(b, dict) else b.asDict(recursive=False)
    table_rows = d.get("rows")
    if table_rows is not None:
        table_rows = [[str(c) for c in r] for r in table_rows]
        if not table_rows:
            table_rows = None
    return {
        "block_id": d["block_id"],
        "type": d["type"],
        "text": d["text"],
        "bbox": list(d["bbox"]),
        "confidence": float(d["confidence"]),
        "rows": table_rows,
        "lines": d.get("lines"),
    }


def _chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in CHUNK_SCHEMA.fields]
    for pdf in batches:
        rows: list[dict[str, Any]] = []
        for conv_id, turn_idx, blocks in zip(pdf["conv_id"], pdf["turn_idx"], pdf["blocks"]):
            blist = [_plain_block(b) for b in blocks]
            rows.extend(build_chunks_for_turn(conv_id, int(turn_idx), blist))
        if rows:
            out = pd.DataFrame(rows, columns=cols)
        else:
            out = pd.DataFrame({c: [] for c in cols})
        out["page_number"] = out["page_number"].astype("int32")
        out["confidence"] = out["confidence"].astype("float64")
        yield out


def build_chunks(extracted: DataFrame) -> DataFrame:
    """K1 over the extracted table (M2). Narrow map — no shuffle; chunk
    explosion happens inside the Arrow batch."""
    return extracted.select("conv_id", "turn_idx", "blocks").mapInPandas(
        _chunk_batches, schema=CHUNK_SCHEMA
    )


def conversation_metrics(extracted: DataFrame) -> DataFrame:
    """R10 totals per conversation (reference: src/pipeline.py:301-309,
    847-855) + the graft's ocr_fallback_rate."""
    return extracted.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("n_blocks").alias("total_blocks"),
        F.sum(
            F.size(F.filter(F.col("blocks"), lambda b: b["type"] == F.lit("table")))
        ).alias("total_tables"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_spans").alias("total_spans"),
        F.avg(F.col("is_fallback").cast("double")).alias("ocr_fallback_rate"),
        F.min("turn_idx").alias("first_turn"),
        F.max("turn_idx").alias("last_turn"),
    )


def run_metrics(extracted: DataFrame) -> DataFrame:
    """Global metrics row (turns parsed, spans emitted, fallback rate) —
    the FIXTURES.md §7 metrics table."""
    return extracted.agg(
        F.count("*").alias("turns_parsed"),
        F.countDistinct("conv_id").alias("conversations"),
        F.sum("n_blocks").alias("blocks_emitted"),
        F.sum("n_spans").alias("spans_emitted"),
        F.sum("n_chars").alias("chars_extracted"),
        F.avg(F.col("is_fallback").cast("double")).alias("ocr_fallback_rate"),
    )


def write_extracted(extracted: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """Sink: parquet, clustered by conversation and ordered within
    partitions so downstream per-conv reads are sequential (the
    reference's ordered-merge determinism, src/pipeline.py:833-845)."""
    (
        extracted.repartition(F.col("conv_id"))
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode(mode)
        .parquet(out_dir)
    )
