"""Canonical schemas for the engine (SURVEY.md §1.3).

Input is the BASELINE.json ``input_hint`` shape; output mirrors the
reference's per-page result model (``Page`` at node-zerox/src/types.ts:124-133
/ py_zerox/pyzerox/core/types.py:22-31) flattened into rows, and the
per-partition lineage table replaces ``ZeroxOutput.summary``/``completionTime``
(node-zerox/src/types.ts:46-55, 260-270).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# input: Common-Crawl-style pages table (exactly input_hint)
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# block-provenance span (kind ∈ heading/para/table/list/code/checkbox/
# logo/watermark/page_number — the output dialect's block taxonomy,
# node-zerox/src/constants.ts:11-23)
SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# per-page extraction result row. status/error mirror PageStatus + ErrorMode
# IGNORE containment (node-zerox/src/types.ts:114-122; index.ts:338-352):
# a failing page yields status='ERROR', markdown='', content_length=0 and
# never kills the task.
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page_no", T.IntegerType(), False),
        T.StructField("markdown", T.StringType(), False),
        T.StructField("content_length", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), True),
    ]
)

# ---------------------------------------------------------------------------
# per-partition lineage/metrics (SURVEY.md §4.3; FIXTURES.md §4)
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_split", T.StringType(), True),
        T.StructField("doc_count", T.LongType(), False),
        T.StructField("page_count", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("elapsed_ms", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        # per-bucket crawl high-watermark (max warc_ts of written rows);
        # max over the whole lineage table = the sink's incremental watermark
        T.StructField("max_warc_ts", T.TimestampType(), True),
    ]
)
