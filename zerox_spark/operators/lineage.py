"""Per-partition lineage/metrics — replaces ZeroxOutput.summary +
completionTime (node-zerox/src/types.ts:260-270, index.ts:574-606) at
partition granularity (SURVEY.md §4.3, FIXTURES.md §4).

The metrics are a grouped aggregation over the raw extract output's carrier
columns (partition_id, elapsed_ms) — a tiny shuffle (one row per partition)
that Catalyst executes with map-side partial aggregation, so the cost at
100 TB is negligible next to the extract itself.

checksum: order-insensitive XOR of xxhash64(url, page_no, markdown) per
partition, rendered as a string. Bitwise-stable across replays, independent
of row arrival order (and immune to ANSI-mode long overflow, unlike sum),
and cheap to recompute for audit; (url, page_no) uniqueness means XOR's
duplicate-cancellation cannot trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from zerox_spark.extract.core import STATUS_ERROR


def lineage_rows(raw_extracted: DataFrame, job_id: str) -> DataFrame:
    """raw extract output → one lineage row per partition (LINEAGE_SCHEMA)."""
    return (
        raw_extracted.groupBy("partition_id")
        .agg(
            F.count_distinct("url").alias("doc_count"),
            F.count(F.lit(1)).alias("page_count"),
            F.bit_xor(F.xxhash64("url", "page_no", "markdown")).alias("_cksum"),
            F.sum("elapsed_ms").alias("elapsed_ms"),
            F.min(F.xxhash64("url")).alias("_hmin"),
            F.max(F.xxhash64("url")).alias("_hmax"),
            F.sum(
                F.when(F.col("status") == STATUS_ERROR, 1).otherwise(0)
            ).alias("_errors"),
            F.max("warc_ts").alias("max_warc_ts"),
        )
        .select(
            F.lit(job_id).alias("job_id"),
            F.col("partition_id"),
            F.concat_ws(":", F.col("_hmin"), F.col("_hmax")).alias("input_split"),
            F.col("doc_count"),
            F.col("page_count"),
            F.col("_cksum").cast("string").alias("checksum"),
            F.col("elapsed_ms"),
            F.when(F.col("_errors") > 0, F.lit("PARTIAL"))
            .otherwise(F.lit("SUCCESS"))
            .alias("status"),
            # per-bucket crawl high-watermark: max over the lineage table is
            # the sink's incremental watermark — computed from written rows,
            # never by re-scanning the input (pipeline.run)
            F.col("max_warc_ts"),
        )
    )


def summary(raw_extracted: DataFrame) -> DataFrame:
    """Job-level Summary analog (totalPages, ocr successful/failed —
    node-zerox/src/types.ts:260-270) as a 1-row DataFrame."""
    return raw_extracted.agg(
        F.count_distinct("url").alias("total_docs"),
        F.count(F.lit(1)).alias("total_pages"),
        F.sum(F.when(F.col("status") == "SUCCESS", 1).otherwise(0)).alias(
            "successful"
        ),
        F.sum(F.when(F.col("status") == STATUS_ERROR, 1).otherwise(0)).alias(
            "failed"
        ),
        F.sum("content_length").alias("total_content_length"),
    )
