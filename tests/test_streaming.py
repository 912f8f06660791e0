"""Structured Streaming surface tests: the batch kernel runs unchanged
in a microbatch, exactly-once via checkpoint, watermarked metrics."""

import os

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.pipeline import extract_turns, synth_transcripts_df
from pdf_parser_spark.streaming import (
    run_stream_to_parquet,
    stream_metrics,
    stream_transcripts,
)


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    synth_transcripts_df(spark, n_convs=10).repartition(4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_stream_extract_matches_batch(spark, input_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = run_stream_to_parquet(spark, input_dir, out, ckpt)
    q.awaitTermination(120)
    streamed = spark.read.parquet(out)
    batch = extract_turns(spark.read.parquet(input_dir))
    sm = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in streamed.collect()
    }
    bm = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in batch.collect()
    }
    assert sm == bm

    # exactly-once: re-running over the same checkpoint adds nothing
    q2 = run_stream_to_parquet(spark, input_dir, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(bm)


def test_stream_metrics_watermarked(spark, input_dir, tmp_path):
    out = str(tmp_path / "metrics_out")
    ckpt = str(tmp_path / "metrics_ckpt")
    m = stream_metrics(stream_transcripts(spark, input_dir))
    q = (
        m.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # append-mode windows only emit once the watermark passes them; the
    # synthetic corpus spans many days, so all but the trailing hour close
    assert got.count() > 0
    total_turns = got.agg(F.sum("turns_parsed")).collect()[0][0]
    assert total_turns <= spark.read.parquet(input_dir).count()
    assert got.filter(F.col("turns_parsed") <= 0).count() == 0
