"""Structured Streaming wrapper around the extraction engine.

The reference is strictly batch (processor.py:342; SURVEY.md §2.3), so
streaming is additive surface, not parity: continuous ingestion of new
interleaved-doc parquet files → the same mapInArrow extract stage →
append-mode parquet sink with checkpointing. Because extraction is
stateless per document, no watermark/state is required; exactly-once
delivery comes from the file-source + checkpoint contract.

    stream_extract(spark, in_dir, out_dir, ckpt_dir).trigger(availableNow=True)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pdfplucker_spark.operators.extract import extract_spans
from pdfplucker_spark.schemas import INPUT_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Returns the started StreamingQuery."""
    src = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    extracted = extract_spans(src)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
):
    """Watermarked tumbling-window aggregation over a file event stream —
    the late-data-tolerant streaming shape (§2.3 streaming row). With
    ``availableNow`` it drains the backlog exactly once; on a live stream
    the watermark bounds state for out-of-order events.
    """
    from pyspark.sql import functions as F

    src = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    # watermarks require TIMESTAMP (not NTZ); cast once on ingest — the
    # batch-equivalence test applies the same cast on its side
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
