"""Structured Streaming variant of the extraction pipeline.

The reference is a batch pipeline (SURVEY.md §2.9: no streaming machinery;
maintainFormat is its only stateful op, and it is per-document, not
cross-event). For crawl feeds that arrive continuously, the same extraction
operator composes with readStream unchanged:

    pages stream (file source / Kafka)          — same input_hint schema
      → extract_pages(...)                      — mapInPandas works on
                                                  streaming DataFrames as-is
      → writeStream parquet + checkpoint        — exactly-once per epoch

Design notes:
- No shuffle in the streaming plan: salted repartition and the latest-
  warc_ts dedupe are batch-compaction concerns; a stream processes each
  micro-batch's files as delivered. The per-document fold still applies
  (all pages of a doc arrive in one row).
- ``stream_metrics`` shows the watermark + windowed-aggregation shape for
  late data: pages/bytes per event-time window, tolerating
  ``late_threshold`` of out-of-order arrival.
- Checkpointing gives resume-on-restart for free (the streaming analog of
  the batch lineage/anti-join machinery in operators/resume.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from zerox_spark.extract.core import ExtractConfig
from zerox_spark.operators.extract import extract_pages
from zerox_spark.schema import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of pages parquet (schema fixed = input_hint)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def stream_extract(
    pages_stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    config: ExtractConfig | None = None,
    num_buckets: int = 64,
    available_now: bool = True,
) -> StreamingQuery:
    """Extraction over a stream; availableNow=True drains the backlog and
    stops (batch-compatible testing mode), False runs continuously."""
    extracted = extract_pages(
        pages_stream, config or ExtractConfig(maintain_format=True), num_buckets
    )
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_metrics(
    pages_stream: DataFrame,
    window: str = "1 minute",
    late_threshold: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window ingest metrics (docs + bytes per
    warc_ts window); late rows beyond the watermark are dropped — the
    standard late-data contract."""
    return (
        pages_stream.withWatermark("warc_ts", late_threshold)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.length("html")).alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "docs",
            "bytes",
        )
    )
