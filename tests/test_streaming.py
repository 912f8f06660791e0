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


def test_stateful_conversation_tracking(spark, tmp_path):
    """applyInPandasWithState: state accumulates across microbatches
    (progress rows), and a quiet conversation times out into a
    completed=true row with state dropped. One continuous query: with
    pending processing-time timeouts, availableNow never terminates."""
    import time

    from pdf_parser_spark.pipeline import TRANSCRIPTS_SCHEMA
    from pdf_parser_spark.streaming import stream_conversation_state

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    all_rows = synth_transcripts_df(spark, n_convs=2).collect()
    conv0 = sorted(
        (r for r in all_rows if r["conv_id"] == "conv_000000"),
        key=lambda r: r["turn_idx"],
    )
    half = len(conv0) // 2
    QUIET_MS = 10_000
    # 2 state-store partitions: per-microbatch overhead scales with the
    # store count and this test ticks every second over 1 conv key
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema=TRANSCRIPTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, name))

    def rows_out(pred):
        try:
            return [r for r in spark.read.parquet(out).collect() if pred(r)]
        except Exception:  # sink dir not created yet
            return []

    def wait_for(pred, timeout_s=150):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            got = rows_out(pred)
            if got:
                return got
            time.sleep(2)
        return []

    write_batch(conv0[:half], "b1")
    write_batch(conv0[half:], "b2")
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_conversation_state(stream, quiet_timeout_ms=QUIET_MS)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # state carry-over: a progress row reaches the full turn count
        full = wait_for(
            lambda r: r["conv_id"] == "conv_000000"
            and not r["completed"]
            and r["n_turns"] == len(conv0)
        )
        assert full, "state did not accumulate across microbatches"
        # quiet period passes -> timeout fires -> completed row, once
        done = wait_for(lambda r: r["conv_id"] == "conv_000000" and r["completed"])
        assert len(done) == 1
        assert done[0]["n_turns"] == len(conv0)
        assert done[0]["n_chars"] == sum(len(r["text"] or "") for r in conv0)
        assert done[0]["last_turn_idx"] == max(r["turn_idx"] for r in conv0)
    finally:
        q.stop()
        q.awaitTermination(60)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_stream_dedup_drops_replayed_files(spark, tmp_path):
    """The same input file ingested twice (at-least-once upstream) must
    yield each (conv_id, turn_idx) exactly once downstream."""
    from pdf_parser_spark.pipeline import TRANSCRIPTS_SCHEMA
    from pdf_parser_spark.streaming import stream_dedup_turns, stream_extract

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    rows = synth_transcripts_df(spark, n_convs=4).collect()
    df = spark.createDataFrame(rows, schema=TRANSCRIPTS_SCHEMA).coalesce(1)
    df.write.parquet(os.path.join(src, "b1"))
    df.write.parquet(os.path.join(src, "b1_replay"))  # exact duplicate batch

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # replay arrives as a separate microbatch
        .parquet(src + "/*")
    )
    q = (
        stream_extract(stream_dedup_turns(stream))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).select("conv_id", "turn_idx").collect()
    keys = [(r["conv_id"], r["turn_idx"]) for r in got]
    assert len(keys) == len(set(keys)) == len(rows)


def test_stream_session_windows_match_batch(spark, tmp_path):
    """session_window sessionization: the streamed (watermarked,
    append-mode) result must be a subset of the batch session_window
    result with identical per-session aggregates, and must cover every
    session that closed before the final watermark."""
    from pdf_parser_spark.streaming import stream_session_stats

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # the testdata parquet stores TIMESTAMP_NTZ; watermarks require
    # event-time TIMESTAMP (with tz) -- cast once, on both paths
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    in_dir = str(tmp_path / "ev_in")
    events.repartition(4).write.mode("overwrite").parquet(in_dir)

    src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(in_dir)
    )
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    q = (
        stream_session_stats(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = spark.read.parquet(out).toPandas()
    assert len(streamed) > 0
    # batch mode: the same expression over the same input
    batch = stream_session_stats(events).toPandas()
    # multi-event sessions exist (the gap logic actually merges)
    assert (batch["n_events"] > 1).any()
    bkey = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.session_value)
        for r in batch.itertuples()
    }
    for r in streamed.itertuples():
        assert bkey[(r.user_id, r.session_start)] == (
            r.session_end,
            r.n_events,
            r.session_value,
        ), f"session mismatch for {r}"
    # nearly all sessions closed (corpus spans ~30 days vs 1h watermark)
    assert len(streamed) >= 0.9 * len(batch)


def test_stream_cms_matches_batch_sketch(spark, input_dir, tmp_path):
    """The streaming CMS cells (complete mode, state capped at
    DEPTH x WIDTH rows) must equal the batch sketch over the same
    data — the merge-by-sum property makes microbatch accumulation
    exact, not approximate, at the cell level."""
    from pdf_parser_spark.streaming import stream_cms_cells, stream_transcripts

    q = (
        stream_cms_cells(stream_transcripts(spark, input_dir))
        .writeStream.format("memory")
        .queryName("cms_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["r"], r["b"]): r["cnt"]
        for r in spark.sql("SELECT * FROM cms_cells").collect()
    }
    batch = {
        (r["r"], r["b"]): r["cnt"]
        for r in stream_cms_cells(spark.read.parquet(input_dir)).collect()
    }
    assert streamed == batch and len(batch) > 0
