"""Structured Streaming surface: incremental extraction over an
arriving transcript table.

The reference's only stream is a Redis queue polled every 2 s
(services/worker/run.py:23-38); our batch engine models that as
checkpoint/resume (runner.py). This module adds the genuinely-streaming
variant for pipelines that tail an ingest table: ``readStream`` over
the parquet/Iceberg dir -> the SAME Arrow extraction kernel (stateless
``mapInPandas`` works unchanged on a streaming DataFrame) ->
``writeStream`` with exactly-once file sink + checkpoint.

Notes:
- The stable-ordering window (row_number over conv_id) is a batch-only
  construct; streaming output carries (conv_id, turn_idx) and ordering
  is restored by any downstream batch read (ORDER BY), as in
  pipeline.fill_turn_gaps.
- Watermarked event-time metrics (turns/fallbacks per hour) show the
  late-data story the reference lacks (SURVEY.md §2.9).
- ``trigger(availableNow=True)`` drains the backlog and stops — the
  incremental-batch mode a 100 TB backfill would use; remove it for a
  continuous tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .pipeline import (
    EXTRACTED_WITH_SEQ_SCHEMA,
    TRANSCRIPTS_SCHEMA,
    _extract_batches,
)

# streaming has no global ordering window; turn_seq here is the
# kernel's provisional turn_idx+1 and is finalized by batch readers
_EXTRACTED_WITH_TS = T.StructType(
    EXTRACTED_WITH_SEQ_SCHEMA.fields + [T.StructField("ts", T.TimestampType(), True)]
)


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)  # bound per-microbatch work
        .parquet(input_dir)
    )


def stream_extract(transcripts: DataFrame) -> DataFrame:
    """Same kernel as the batch hot path — stateless, so it runs
    unchanged inside a microbatch."""
    return transcripts.mapInPandas(_extract_batches, schema=EXTRACTED_WITH_SEQ_SCHEMA)


def stream_metrics(transcripts: DataFrame) -> DataFrame:
    """Watermarked per-hour extraction metrics (append-mode safe). The
    watermark is applied to the kernel's OUTPUT ts (an opaque UDF stage
    would otherwise drop watermark metadata)."""
    extracted = transcripts.mapInPandas(
        _with_ts(_extract_batches), schema=_EXTRACTED_WITH_TS
    )
    return (
        extracted.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("turns_parsed"),
            F.sum(F.col("is_fallback").cast("long")).alias("fallback_turns"),
            F.sum("n_chars").alias("chars_extracted"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "turns_parsed",
            "fallback_turns",
            "chars_extracted",
        )
    )


def _with_ts(inner):
    """Attach the input ``ts`` to the kernel output POSITIONALLY: the
    extraction kernel emits exactly one output row per input row in
    input order, so ts rides along by index. (A (conv_id, turn_idx)
    merge would fan out on duplicated keys — replayed/duplicated ingest
    files, exactly what streaming must tolerate — and double-count
    every metric downstream.)"""

    def gen(batches):
        for pdf in batches:
            for out in inner(iter([pdf])):
                assert len(out) == len(pdf), "kernel must be 1 row in : 1 row out"
                out = out.copy()
                out["ts"] = pdf["ts"].to_numpy()
                yield out

    return gen


def run_stream_to_parquet(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Launch the streaming extraction; returns the StreamingQuery.
    Exactly-once via the file-sink commit log + checkpoint — the
    streaming analogue of runner.py's bucket lineage."""
    extracted = stream_extract(stream_transcripts(spark, input_dir))
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
